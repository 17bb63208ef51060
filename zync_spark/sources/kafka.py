"""Kafka source/sink configuration for Spark Structured Streaming.

The reference reads broker/auth config from ``~/.zync/kafka.json``
(cli/flags.go:36-141); this module reads the same file shape and produces
the option maps for Spark's kafka data source. The actual connector
(spark-sql-kafka) and a broker are deployment-time dependencies — absent in
this container — so everything here is pure option/DataFrame plumbing,
gated by `kafka_available()`, and the pipeline logic in streaming/ accepts
any DataFrame with the kafka frame columns (topic, partition, offset, key,
value) so it is fully testable without a broker.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

FRAME_COLUMNS = ["topic", "partition", "offset", "key", "value"]


def load_kafka_config(path: str | None = None) -> dict:
    """~/.zync/kafka.json: {"bootstrap_servers": ..., sasl/tls options}."""
    path = path or os.path.expanduser("~/.zync/kafka.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def kafka_options(config: dict, topics: list[str] | None = None,
                  starting_offsets: dict[str, dict[str, int]] | None = None) -> dict:
    """Spark kafka-source options from a zync-style config.

    starting_offsets: {topic: {partition(str): offset}} → the JSON form of
    the `startingOffsets` option (resume semantics, fifo/lake.go:62-82)."""
    opts = {"kafka.bootstrap.servers": config.get("bootstrap_servers", "localhost:9092")}
    # accept both the reference's kafka.json spellings (sasl_mechanisms,
    # sasl_username/sasl_password — kafka.json:1-10) and the singular forms
    mech = config.get("sasl_mechanism") or config.get("sasl_mechanisms")
    if mech:
        opts["kafka.sasl.mechanism"] = mech
        opts["kafka.security.protocol"] = config.get("security_protocol", "SASL_SSL")
        user = config.get("username") or config.get("sasl_username", "")
        password = config.get("password") or config.get("sasl_password", "")
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="{user}" password="{password}";'
        )
    if topics:
        opts["subscribe"] = ",".join(topics)
    if starting_offsets:
        opts["startingOffsets"] = json.dumps(
            {t: {str(p): o for p, o in parts.items()} for t, parts in starting_offsets.items()}
        )
    return opts


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_stream(spark: SparkSession, config: dict, topics: list[str],
                starting_offsets: dict | None = None,
                max_offsets_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(config, topics, starting_offsets).items():
        reader = reader.option(k, v)
    if max_offsets_per_trigger is not None:
        # SOURCE option (the write side ignores it): bounds each
        # micro-batch — the reference's -thresh commit-size cap
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def read_batch(spark: SparkSession, config: dict, topics: list[str],
               starting_offsets: dict | None = None) -> DataFrame:
    reader = spark.read.format("kafka")
    for k, v in kafka_options(config, topics, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load()


def write_batch(df: DataFrame, config: dict, topic: str) -> None:
    """Batched async produce via the kafka sink — replaces the reference's
    synchronous per-record ProduceSync loop (fifo/producer.go:96-100)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", kafka_options(config)["kafka.bootstrap.servers"])
        .option("topic", topic)
        .save()
    )
