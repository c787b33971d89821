"""Config loading — functional mirror of the reference's StreamsUtils
(reference: src/main/java/org/example/StreamsUtils.java:16-27:
loadProperties + propertiesToMap).

Java `.properties` files are flat `key=value` lines; we parse them into
a dict and expose a helper that splits Spark conf (`spark.*`) from
engine options (topics, grace, checkpoint dir).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse a Java-style .properties file into a dict.

    Supports `#`/`!` comments, `key=value` and `key:value`, and strips
    whitespace — the subset the reference's dev.properties uses.
    """
    props: dict[str, str] = {}
    for raw in Path(path).read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        # Java properties split on the FIRST occurring separator, so
        # `key:a=b` is ("key", "a=b"), not ("key:a", "b").
        seps = [s for s in ("=", ":") if s in line]
        if seps:
            sep = min(seps, key=line.find)
            key, _, value = line.partition(sep)
            props[key.strip()] = value.strip()
        else:
            props[line] = ""
    return props


@dataclass
class EngineConfig:
    """Runtime options for the streaming reorder app (the analog of
    configuration/dev.properties:1-10 in the reference)."""

    input_topic: str = "reorder-input-topic"
    output_topic: str = "reorder-output-topic"
    bootstrap_servers: str = "localhost:9092"
    grace: str = "10 hours"  # Application.java:144
    checkpoint_dir: str = "/tmp/spark-reorder-checkpoint"
    spark_conf: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_properties(cls, path: str | Path) -> "EngineConfig":
        props = load_properties(path)
        spark_conf = {k: v for k, v in props.items() if k.startswith("spark.")}
        return cls(
            input_topic=props.get("input.topic.name", cls.input_topic),
            output_topic=props.get("output.topic.name", cls.output_topic),
            bootstrap_servers=props.get("bootstrap.servers", cls.bootstrap_servers),
            grace=props.get("reorder.grace", cls.grace),
            checkpoint_dir=props.get("checkpoint.dir", cls.checkpoint_dir),
            spark_conf=spark_conf,
        )
