"""The parity sweep is un-skippable: this test goes red whenever any
operator/oracle source changed after the last recorded all-oracle
sweep (PARITY_SWEEP.json), or the sweep itself had failures. Refresh
with:  python regress.py --parity --all   (sf0.01 default).

Round-5 postmortem: an aggregate edit shipped unswept and broke q1 at
the driver's gate; this turns that mistake into a visible test
failure instead of a silent round regression.
"""

from tools.parity_stamp import STAMP, ops_hash, status


def test_parity_stamp_fresh():
    mode, stamp = status()
    assert mode == "fresh", (
        f"PARITY_SWEEP.json is {mode}: operator sources (hash "
        f"{ops_hash()}) changed since the last all-oracle sweep "
        f"(stamp: {stamp.get('ops_hash')}, sweeps: "
        f"{stamp.get('sweeps')}). Run `python regress.py --parity "
        f"--all` and commit the refreshed {STAMP.name}."
    )
