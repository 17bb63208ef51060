"""Generate the reference's zed ETL program text from a transform spec —
the `zync etl -zed` dump (etl/build.go, golden output ztests/etl-zed.yaml).

The DataFrame compiler (etl/compile.py) executes the YAML directly; this
module emits the PROGRAM the reference's own compiler would emit, and
zedpipe can RUN that text (tests prove both paths agree). Together they
close the parity loop: one YAML spec → the reference's program text →
either engine.

Program shape (ztests/etl-zed.yaml:10-94):

  type done = {kafka:{topic:string,offset:int64}}
  fork (                                  # ingest: per input topic,
    => from (                             # raw minus done markers
      pool "Raw" => kafka.topic=="T"
      pool "Staging" => is(<done>) kafka.topic=="T"
    ) | anti join on kafka.offset=kafka.offset
    ...
  )
  | yield this
  | switch (                              # one case per rule, declared order
    case <where> =>                       # denorm: per-side yield+sort fork
      fork ( => ... {left:this} ... => ... {right:this} ... )
      | join on <join-on> right:=right
      | fork ( => <user zed> | out.kafka:=left.kafka | yield out
               | kafka.topic:="Out"
               => yield {left:cast(...,done), right:cast(...,done)} )
    case (<where>) and kafka.topic=="T" =>  # stateless
      fork ( => yield {in:this} <user zed> | out.kafka:=in.kafka
             | yield out | kafka.topic:="Out"
             => yield cast({kafka:{...}},done) )
  )
  | sort kafka.offset
"""

from __future__ import annotations

from zync_spark.etl.config import Transform


def _marker_pool(t: Transform, topic: str) -> str:
    """The pool holding `topic`'s done markers = the output pool of the
    rules consuming it (unique by the per-input same-pool constraint,
    etl/routes.go:62-70)."""
    for rule in t.rules:
        if topic in (rule.in_topic, rule.left, rule.right):
            return t.output_pool_for_topic(rule.out)
    return t.output.pool


def _snippet(zed: str) -> str:
    """The user zed block as spliced by the reference (etl/build.go:172-173):
    leading pipe of the first statement dropped (it follows `=>` or a
    preceding stage directly), internal pipes kept."""
    s = zed.strip()
    if s.startswith("|"):
        s = s[1:].lstrip()
    return s


def generate_program(t: Transform) -> str:
    for rule in t.rules:
        if rule.zed is None:
            raise ValueError(
                "cannot generate a zed program for a spark_sql:-only rule "
                "(the escape hatch has no zed text); run it through the "
                "DataFrame compiler instead")
    out: list[str] = []
    w = out.append
    w("type done = {kafka:{topic:string,offset:int64}}")

    # -- ingest fork: raw-minus-markers per input topic (etl/build.go:111-116)
    w("fork (")
    for i, route in enumerate(t.inputs):
        if i:
            w("")
        w("  => from (")
        w(f'    pool "{route.pool}" => kafka.topic=="{route.topic}"')
        w(f'    pool "{_marker_pool(t, route.topic)}" => '
          f'is(<done>) kafka.topic=="{route.topic}"')
        w("  ) | anti join on kafka.offset=kafka.offset")
    w(")")
    w("| yield this")

    # -- routing switch: one case per rule in declared order (first-match)
    w("| switch (")
    for rule in t.rules:
        if rule.type == "denorm":
            w(f"  case {rule.where} =>")
            lk, rk = rule.join_on.split("=", 1)
            w("    fork (")
            w(f'      => kafka.topic=="{rule.left}" | yield {{left:this}} '
              f"| sort {lk}")
            w(f'      => kafka.topic=="{rule.right}" | yield {{right:this}} '
              f"| sort {rk}")
            w("    )")
            w(f"    | join on {rule.join_on} right:=right")
            w("    | fork (")
            w("      =>")
            w("          // === user-defined ETL ===")
            w(f"          {_snippet(rule.zed)}")
            w("        | out.kafka:=left.kafka")
            w("        | yield out")
            w(f'        | kafka.topic:="{rule.out}"')
            w("      =>  yield {")
            w("             left:cast({kafka:{topic:left.kafka.topic,"
              "offset:left.kafka.offset}},done),")
            w("             right:cast({kafka:{topic:right.kafka.topic,"
              "offset:right.kafka.offset}},done)")
            w("          }")
            w("    )")
        else:
            w(f'  case ({rule.where}) and kafka.topic=="{rule.in_topic}" =>')
            w("    fork (")
            w("      =>")
            w("        yield {in:this}")
            w("        // === user-defined ETL ===")
            w(f"        | {_snippet(rule.zed)}")
            w("        | out.kafka:=in.kafka")
            w("        | yield out")
            w(f'        | kafka.topic:="{rule.out}"')
            w("      =>")
            w("        yield cast({kafka:{topic:kafka.topic,"
              "offset:kafka.offset}},done)")
            w("    )")
    w(")")
    w("| sort kafka.offset")
    return "\n".join(out) + "\n"
