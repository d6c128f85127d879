"""Deterministic scale-up generator: build sfN parquet tables from an
existing sf directory by key-shifted replication.

The driver's testdata tops out at sf0.1 (TESTDATA.md); the scale-
stress sweep (VERDICT r2 item 1) needs the next decade. This builds
it WITHOUT inventing a new distribution: copy 0 is the source data
bit-for-bit (so sfN ⊇ sf0.1 and every planted structure survives),
copies 1..K-1 shift every key column by its table's dense-domain
stride — all key domains in the testdata are dense 0-based, so
equality-join coverage fractions (e.g. 40% of doc_ids having an
embedding row) are preserved exactly at any K.

Two tables get content perturbation instead of bit-copies, because
exact replication would turn every document/vector into a 10-clique
of perfect duplicates and quadratically distort the similarity
workloads (the opposite of a realistic corpus):

- documents: ~1/4 of tokens swapped for hash-derived words (crc32 of
  (copy, doc_id, position) — no RNG state, fully reproducible),
  dropping cross-copy 3-gram Jaccard far below dedup thresholds
  while keeping length/lang distributions close; n_chars recomputed.
- embeddings: each copy k>0 is the source set under a random
  ORTHOGONAL rotation (QR of a seeded Gaussian matrix) — intra-copy
  geometry (norms, pairwise cosines, label clusters) is preserved
  exactly, while cross-copy cosine collapses to the natural
  random-pair distribution (mean ~0 at dim 64), so no vector gains
  phantom near-duplicates across copies.

region/nation stay fixed (TPC-H scales facts, not geography).

Usage: python tools/gen_scale.py <src_dir> <out_dir> [copies]
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# dense 0-based key domains at any sf; stride = domain size at src sf
KEY_COLUMNS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

FIXED_TABLES = ("region", "nation")
TABLES = list(FIXED_TABLES) + list(KEY_COLUMNS)


def _strides(src: str) -> dict[str, int]:
    s: dict[str, int] = {}
    for t in KEY_COLUMNS:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        s[t] = tbl.num_rows
        if t == "events":
            s["users"] = (
                pc.max(tbl.column("user_id")).as_py() + 1  # type: ignore[attr-defined]
            )
    return s


def _mutate_texts(texts: list[str], doc_ids: list[int], copy: int) -> list[str]:
    out = []
    for doc_id, text in zip(doc_ids, texts):
        toks = text.split(" ")
        base = zlib.crc32(f"{copy}:{doc_id}".encode())
        for i in range(len(toks)):
            h = zlib.crc32(str(i).encode(), base)
            if h % 4 == 0:
                toks[i] = f"w{h % 977}"
        out.append(" ".join(toks))
    return out


def _perturb_embeddings(tbl: pa.Table, copy: int) -> pa.Array:
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(42_000 + copy)
    q, r = np.linalg.qr(rng.standard_normal((emb.shape[1], emb.shape[1])))
    q *= np.sign(np.diag(r))  # fix QR sign ambiguity for determinism
    rotated = emb @ q
    return pa.array(
        [row for row in rotated.astype(np.float32)],
        type=pa.list_(pa.float32()),
    )


def _copy_table(
    tbl: pa.Table, name: str, copy: int, strides: dict[str, int]
) -> pa.Table:
    if copy == 0:
        return tbl
    arrays = []
    for field in tbl.schema:
        col = tbl.column(field.name)
        domain = KEY_COLUMNS[name].get(field.name)
        if domain is not None:
            shifted = pc.add(col, copy * strides[domain])
            arrays.append(pc.cast(shifted, field.type))
        else:
            arrays.append(col)
    out = pa.table(arrays, schema=tbl.schema)
    if name == "documents":
        texts = _mutate_texts(
            out.column("text").to_pylist(),
            out.column("doc_id").to_pylist(),
            copy,
        )
        out = out.set_column(
            out.schema.get_field_index("text"),
            pa.field("text", pa.string()),
            pa.array(texts, type=pa.string()),
        )
        out = out.set_column(
            out.schema.get_field_index("n_chars"),
            pa.field("n_chars", pa.int64()),
            pa.array([len(t) for t in texts], type=pa.int64()),
        )
    elif name == "embeddings":
        out = out.set_column(
            out.schema.get_field_index("embedding"),
            out.schema.field("embedding"),
            _perturb_embeddings(out, copy).cast(
                out.schema.field("embedding").type
            ),
        )
    return out


def generate(
    src: str,
    dst: str,
    copies: int = 10,
    tables: list[str] | None = None,
) -> None:
    """`tables` restricts generation to a named subset (e.g. a
    documents-only fifth-decade slice for the dedup asymptote probes
    — full sf30 would be 9 GB of facts nothing there reads)."""
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)
    for name in tables if tables is not None else TABLES:
        src_tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
        if name in FIXED_TABLES:
            parts = [src_tbl]
        else:
            parts = [
                _copy_table(src_tbl, name, k, strides)
                for k in range(copies)
            ]
        merged = pa.concat_tables(parts)
        pq.write_table(
            merged,
            os.path.join(dst, f"{name}.parquet"),
            # row groups sized so Spark's maxPartitionBytes splits
            # the big facts into parallel scan tasks
            row_group_size=256 * 1024,
        )
        print(f"{name}: {merged.num_rows} rows", flush=True)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else ".testdata/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tables = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    generate(src, dst, copies, tables)
