# Container image for the Spark log-pipeline + analytics engine.
# Spark runs in local mode inside the container for the forwarder
# workload (the reference deployment's shape: one consumer process
# per container, shard-parallel inside); for cluster runs, ship this
# same image as the PySpark driver/executor image and submit with
# spark-submit instead of the module entrypoint.
FROM python:3.11-slim

# pyspark needs a JRE (17 matches the tested runtime)
RUN apt-get -y update \
    && apt-get install -y -q --no-install-recommends openjdk-17-jre-headless \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

RUN pip install --no-cache-dir \
    pyspark==4.1.2 pyarrow pandas numpy

WORKDIR /app
COPY kinesis_to_firehose_spark kinesis_to_firehose_spark
COPY __spark_entry__.py bench.py regress.py ./

# config comes from the environment (streaming/config.py reads the
# KINESIS_*/FIREHOSE_*/LOG_FILE/READ_RATE_LIMIT block — see
# launch/kinesis-to-firehose-spark.yml); the CLI surface is
# `python -m kinesis_to_firehose_spark <cmd>`
ENTRYPOINT ["python", "-m", "kinesis_to_firehose_spark"]
CMD ["consume"]
