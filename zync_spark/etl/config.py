"""ETL YAML config schema + route validation.

Mirrors the reference's config surface (etl/yaml.go:9-29) and route
analysis (etl/routes.go:13-73, etl/build.go:29-57): inputs map topics to
pools, the output names a topic and pool, and each transform rule is either
`stateless` (one input topic) or `denorm` (a two-topic equi-join).

Beyond-reference extension: a rule may carry `spark_sql:` instead of
`zed:` — a raw Spark SQL projection escape hatch (SURVEY §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml


@dataclass
class Route:
    topic: str
    pool: str


@dataclass
class Rule:
    type: str                   # 'stateless' | 'denorm'
    where: str | None
    out: str                    # output topic
    zed: str | None = None      # projection snippet (out := {...})
    spark_sql: str | None = None
    in_topic: str | None = None   # stateless
    left: str | None = None       # denorm
    right: str | None = None
    join_on: str | None = None    # "left.path=right.path"


@dataclass
class Transform:
    inputs: list[Route]
    outputs: list[Route]
    rules: list[Rule] = field(default_factory=list)

    @property
    def output(self) -> Route:
        """The first (often only) output route — single-output sugar."""
        return self.outputs[0]

    def input_topics(self) -> list[str]:
        return [r.topic for r in self.inputs]

    def pool_for_topic(self, topic: str) -> str:
        for r in self.inputs:
            if r.topic == topic:
                return r.pool
        raise ConfigError(f"no route for input topic {topic!r}")

    def output_pool_for_topic(self, topic: str) -> str:
        for r in self.outputs:
            if r.topic == topic:
                return r.pool
        raise ConfigError(f"no route for output topic {topic!r}")

    def pool_names(self) -> set[str]:
        return {r.pool for r in self.inputs} | {r.pool for r in self.outputs}


class ConfigError(ValueError):
    pass


def load_config(path_or_text: str) -> Transform:
    """Parse + validate a transform YAML (path or inline text)."""
    if "\n" in path_or_text or ":" not in path_or_text.split("\n", 1)[0] and not (
        path_or_text.endswith((".yaml", ".yml"))
    ):
        text = path_or_text
    else:
        with open(path_or_text) as f:
            text = f.read()
    doc = yaml.safe_load(text)
    return parse_config(doc)


def parse_config(doc: dict) -> Transform:
    if not isinstance(doc, dict):
        raise ConfigError("transform config must be a mapping")
    inputs = [Route(i["topic"], i["pool"]) for i in doc.get("inputs", [])]
    if not inputs:
        raise ConfigError("at least one input route required")
    # `output:` (reference schema, etl/yaml.go:11) or `outputs:` (extension
    # matching the reference's per-output-topic program loop,
    # etl/build.go:66-80, which its single-output YAML could not express).
    out_doc = doc.get("outputs") or ([doc["output"]] if doc.get("output") else [])
    if not out_doc:
        raise ConfigError("output route required")
    outputs = [Route(o["topic"], o["pool"]) for o in out_doc]

    # Route validation (etl/routes.go:33-40): each topic maps to exactly
    # one pool, across inputs AND outputs.
    seen: dict[str, str] = {}
    for r in inputs + outputs:
        if r.topic in seen and seen[r.topic] != r.pool:
            raise ConfigError(
                f"topic {r.topic!r} routed to multiple pools: "
                f"{seen[r.topic]!r} and {r.pool!r}"
            )
        seen[r.topic] = r.pool

    topics = {r.topic for r in inputs}
    out_topics = {r.topic for r in outputs}
    output = outputs[0]
    rules: list[Rule] = []
    for t in doc.get("transforms", []):
        kind = t.get("type")
        if kind == "stateless":
            if t.get("in") not in topics:
                raise ConfigError(f"stateless rule input {t.get('in')!r} not an input topic")
            rules.append(
                Rule(
                    type="stateless",
                    where=t.get("where"),
                    out=t.get("out", output.topic),
                    zed=t.get("zed"),
                    spark_sql=t.get("spark_sql"),
                    in_topic=t["in"],
                )
            )
        elif kind == "denorm":
            for side in ("left", "right"):
                if t.get(side) not in topics:
                    raise ConfigError(f"denorm {side} {t.get(side)!r} not an input topic")
            join_on = t.get("join-on") or t.get("join_on")
            if not join_on or "=" not in join_on:
                raise ConfigError("denorm rule needs join-on: left.path=right.path")
            rules.append(
                Rule(
                    type="denorm",
                    where=t.get("where"),
                    out=t.get("out", output.topic),
                    zed=t.get("zed"),
                    spark_sql=t.get("spark_sql"),
                    left=t["left"],
                    right=t["right"],
                    join_on=join_on,
                )
            )
        else:
            raise ConfigError(f"unknown transform type {kind!r}")
        if rules[-1].zed is None and rules[-1].spark_sql is None:
            raise ConfigError("rule needs zed: or spark_sql: projection")
        if rules[-1].out not in out_topics:
            raise ConfigError(
                f"rule out topic {rules[-1].out!r} is not an output route"
            )
    if not rules:
        raise ConfigError("at least one transform rule required")

    # Per-input same-pool constraint (etl/routes.go:62-70): every output
    # topic fed by a given input topic must land in the same pool, because
    # that pool holds the input's done markers.
    t = Transform(inputs=inputs, outputs=outputs, rules=rules)
    input_pool: dict[str, str] = {}
    for rule in rules:
        out_pool = t.output_pool_for_topic(rule.out)
        for src in filter(None, (rule.in_topic, rule.left, rule.right)):
            prev = input_pool.setdefault(src, out_pool)
            if prev != out_pool:
                raise ConfigError(
                    f"input topic {src!r} routed to multiple output pools "
                    f"({prev!r} and {out_pool!r})"
                )
    return t
