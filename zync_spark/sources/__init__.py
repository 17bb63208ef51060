"""Sources/sinks and type bridges: Avro (Confluent wire format + schema
registry), Kafka Connect JSON, Kafka batch/stream readers and writers, and
file formats (SURVEY §2.1)."""
