"""Translator for the reference's user-facing expression subset → Spark
Columns.

The reference's extension point is arbitrary Zed script injection in shaper
files and ETL YAML (cli/shaper.go:8-22, etl/yaml.go:28); the *documented*
surface actually exercised (SURVEY §2.8) is a small expression language:

  record literals        {key: left.key, value: {ID: in.value.after.ID}}
  dotted paths           left.value.after.ID, this
  field assignment       out := {...},  rec.kafka.offset := expr
  predicates             ==, !=, <, <=, >, >=, in [..], and, or, not
  arithmetic             + - * / %
  literals               "s", 123, 1.5, true, false, null
  map literals           |{"jane": 1, "bob": 2}| (demo/etl.zed:1-9)
  array literals         ["a", "b"]
  const bindings         const ids = |{...}|;  prologue (demo/etl.zed:1-9)
  functions              to_upper(s), split(s, sep), cast(x, T), typeof(x)
  array index            records[0], map lookup m[k]

This module parses that subset (recursive descent — no dependency on the
reference's grammar machinery) and emits `pyspark.sql.Column` expressions,
so user snippets execute JVM-side inside whole-stage codegen, never in
Python. Anything beyond the subset can be supplied as raw Spark SQL via the
`spark_sql:` escape hatch in the YAML (SURVEY §2.10).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType, StructType

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
  | (?P<duration>\d+(?:ns|us|ms|s|m|h|d|w|y)\b)
  | (?P<float>\d+\.\d*|\.\d+)
  | (?P<int>\d+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<assign>:=)
  | (?P<op>==|!=|<=|>=|\|\||&&|[<>+\-*/%().,{}\[\]:|;=])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "null", "true", "false", "this"}

# zed function name → builder over translated args
_FUNCTIONS = {
    "to_upper": lambda a: F.upper(a[0]),
    "to_lower": lambda a: F.lower(a[0]),
    "split": lambda a: F.split(a[0], a[1]),
    "len": lambda a: F.length(a[0]),
    "abs": lambda a: F.abs(a[0]),
    "lower": lambda a: F.lower(a[0]),
    "upper": lambda a: F.upper(a[0]),
    "trim": lambda a: F.trim(a[0]),
    "replace": lambda a: F.regexp_replace(a[0], a[1], a[2]),
    "coalesce": lambda a: F.coalesce(*a),
    # zed stdlib surface beyond the documented examples (public zed docs):
    # grep(<regexp>, <string>) — regex containment predicate
    "grep": lambda a: F.regexp_like(a[1], a[0]),
    "floor": lambda a: F.floor(a[0]),
    "ceil": lambda a: F.ceil(a[0]),
    "round": lambda a: F.round(a[0]),
    "sqrt": lambda a: F.sqrt(a[0]),
    "pow": lambda a: F.pow(a[0], a[1]),
    "log": lambda a: F.log(a[0]),
    # join(<array>, <sep>) — array-of-strings to string. array_join()
    # only takes a Python-str delimiter, but translated args are Columns,
    # so fold with concat instead.
    "join": lambda a: F.aggregate(
        a[0],
        F.lit("").cast("string"),
        lambda acc, x: F.when(acc == "", x).otherwise(F.concat(acc, a[1], x)),
    ),
    # time (zed stdlib: now(), bucket() — bucket with a duration literal is
    # special-cased in parse_call; this entry covers bucket(ts, <seconds>))
    "now": lambda a: F.current_timestamp(),
    # strings / encodings
    "levenshtein": lambda a: F.levenshtein(a[0], a[1]),
    "hex": lambda a: F.lower(F.hex(a[0])),
    "unhex": lambda a: F.unhex(a[0]),
    "base64": lambda a: F.base64(a[0].cast("binary")),
    "regexp_replace": lambda a: F.regexp_replace(a[1], a[0], a[2]),
    "position": lambda a: F.instr(a[0], a[1]),
    # parse_uri(<string>) → record of URL components (zed stdlib shape)
    "parse_uri": lambda a: F.struct(
        F.parse_url(a[0], F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(a[0], F.lit("HOST")).alias("host"),
        F.parse_url(a[0], F.lit("PATH")).alias("path"),
        F.parse_url(a[0], F.lit("QUERY")).alias("query"),
        F.parse_url(a[0], F.lit("REF")).alias("fragment"),
    ),
    # networks (zed stdlib cidr_match/network_of). IPv4 dotted-quad only —
    # pure Column arithmetic, stays in whole-stage codegen.
    "cidr_match": lambda a: _cidr_match(a[0], a[1]),
    "network_of": lambda a: _network_of(a[0], a[1]),
    # arrays (zed stdlib): compact strips nulls, flatten concatenates one
    # nesting level, sort() is the FUNCTION form (ascending, nulls last —
    # distinct from the sort OPERATOR, which only wins at stage-head
    # position)
    "compact": lambda a: F.filter(a[0], lambda x: x.isNotNull()),
    "flatten": lambda a: F.flatten(a[0]),
    "sort": lambda a: F.sort_array(a[0]),
}


def _ip_to_long(ip: Column) -> Column:
    """Dotted-quad string → uint32-as-long, as a codegen-friendly fold."""
    return F.aggregate(
        F.split(ip, r"\."),
        F.lit(0).cast("long"),
        lambda acc, octet: acc * 256 + octet.cast("long"),
    )


def _cidr_match(net: Column, addr: Column) -> Column:
    """cidr_match("10.1.0.0/16", ip) — true when addr falls in the network.
    prefix may be a column, so mask via pow(2, 32-p) (exact in double for
    p in 0..32) instead of shiftright (which needs a literal bit count)."""
    prefix = F.split(net, "/")[1].cast("int")
    netip = _ip_to_long(F.split(net, "/")[0])
    ip = _ip_to_long(addr)
    host_bits = F.pow(F.lit(2.0), 32 - prefix)
    return (
        F.floor(ip / host_bits).cast("long")
        == F.floor(netip / host_bits).cast("long")
    )


def _network_of(addr: Column, prefix: Column) -> Column:
    """network_of(ip, prefixlen) → "a.b.c.0/len" masked network string."""
    ip = _ip_to_long(addr)
    host_bits = F.pow(F.lit(2.0), 32 - prefix.cast("int"))
    masked = (F.floor(ip / host_bits).cast("long") * host_bits).cast("long")
    octets = [
        ((masked / F.lit(d)).cast("long") % 256).cast("string")
        for d in (16777216, 65536, 256, 1)
    ]
    return F.concat_ws("/", F.concat_ws(".", *octets), prefix.cast("string"))


_DURATION_US = {
    "ns": 0.001, "us": 1, "ms": 1000, "s": 1_000_000,
    "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000,
    "w": 604_800_000_000, "y": 31_536_000_000_000,
}


def _duration_micros(text: str) -> int:
    m = re.fullmatch(r"(\d+)(ns|us|ms|s|m|h|d|w|y)", text)
    return int(int(m.group(1)) * _DURATION_US[m.group(2)])


# strftime %-codes → Spark/Java DateTimeFormatter patterns. The subset the
# reference's ecosystem (and DuckDB, our oracle) shares.
_STRFTIME_MAP = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm",
    "%S": "ss", "%y": "yy", "%j": "DDD", "%b": "MMM", "%B": "MMMM",
    "%a": "EEE", "%A": "EEEE", "%%": "%",
}


def strftime_to_java(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            code = fmt[i : i + 2]
            if code not in _STRFTIME_MAP:
                raise ZedSyntaxError(f"unsupported strftime code {code!r}")
            out.append(_STRFTIME_MAP[code])
            i += 2
        elif fmt[i].isalpha():
            # bare letters are pattern chars to Java — quote them
            out.append(f"'{fmt[i]}'")
            i += 1
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


@dataclass
class Token:
    kind: str
    text: str
    pos: int


def tokenize(src: str) -> list[Token]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ZedSyntaxError(f"bad character {src[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        text = m.group()
        if kind == "ident" and text in _KEYWORDS:
            kind = text
        out.append(Token(kind, text, m.start()))
    out.append(Token("eof", "", len(src)))
    return out


class ZedSyntaxError(ValueError):
    pass


class Context:
    """Resolution context: maps root identifiers to Columns and (optionally)
    to Spark DataTypes for typeof()/cast() support.

    roots: {"in": Column, "left": Column, ...}. A path whose head is not a
    root resolves against `default_root` (the record itself = `this`).
    """

    def __init__(self, roots: dict[str, Column] | None = None,
                 schema: StructType | None = None,
                 default_root: Column | None = None,
                 named_types: dict[str, DataType] | None = None,
                 path_names: dict[str, str] | None = None,
                 names_sink: dict[str, str] | None = None):
        self.roots = roots or {}
        self.schema = schema
        self.default_root = default_root
        # `type NAME = {...}` prologue declarations (ztests/etl-zed.yaml:10)
        self.named_types = named_types or {}
        # Named-type DECORATIONS by dotted path — the registry surface
        # that carries zed's nested named types, which Spark's schema
        # cannot hold per-value (SURVEY §1.2). `path_names` is the READ
        # side: typeof(a.b) renders the decoration; cast(x, typeof(a.b))
        # re-tags. `names_sink` is the WRITE side: decorations declared
        # during compilation (cast-to-named inside record literals /
        # assignments) accumulate here for the caller to persist (Pool
        # `types.json` sidecar, connectjson wire schema names).
        self.path_names = path_names or {}
        self.names_sink = names_sink if names_sink is not None else {}

    def resolve(self, path: list[str]) -> Column:
        head, rest = path[0], path[1:]
        if head in self.roots:
            col = self.roots[head]
        elif self.default_root is not None:
            col, rest = self.default_root, path
        else:
            col, rest = F.col(head), path[1:]
        for p in rest:
            col = col[p]
        return col

    def resolve_type(self, path: list[str]) -> DataType:
        if self.schema is None:
            raise ZedSyntaxError("typeof() needs a schema-bearing context")
        dt: DataType = self.schema
        for p in path:
            if not isinstance(dt, StructType):
                raise ZedSyntaxError(f"typeof: {'.'.join(path)} not a struct path")
            try:
                dt = dt[p].dataType
            except KeyError:
                raise ZedSyntaxError(
                    f"no field {p!r} in path {'.'.join(path)}") from None
        return dt


class Parser:
    def __init__(self, tokens: list[Token], ctx: Context):
        self.toks = tokens
        self.i = 0
        self.ctx = ctx
        # field-name stack while inside record literals: a tagged value at
        # the current position decorates ".".join(_fstack) in names_sink
        self._fstack: list[str] = []

    # -- token helpers -----------------------------------------------------

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise ZedSyntaxError(f"expected {text or kind}, got {t.text!r} at {t.pos}")
        return t

    def accept(self, kind: str, text: str | None = None) -> Token | None:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    # -- grammar -----------------------------------------------------------

    def parse_expr(self) -> Column:
        return self.parse_or()

    def parse_or(self) -> Column:
        left = self.parse_and()
        while self.accept("or") or self.accept("op", "||"):
            left = ensure_column(left, "operand") \
                | ensure_column(self.parse_and(), "operand")
        return left

    def parse_and(self) -> Column:
        left = self.parse_not()
        while self.accept("and") or self.accept("op", "&&"):
            left = ensure_column(left, "operand") \
                & ensure_column(self.parse_not(), "operand")
        return left

    def parse_not(self) -> Column:
        if self.accept("not"):
            return ~ensure_column(self.parse_not(), "operand")
        return self.parse_cmp()

    def parse_cmp(self) -> Column:
        left = self.parse_add()
        t = self.peek()
        if t.kind == "op" and t.text in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            # sentinels (durations, typeof) are not comparable values
            left = ensure_column(left, "operand")
            right = ensure_column(self.parse_add(), "operand")
            return {
                "==": lambda: left == right,
                "!=": lambda: left != right,
                "<": lambda: left < right,
                "<=": lambda: left <= right,
                ">": lambda: left > right,
                ">=": lambda: left >= right,
            }[t.text]()
        if t.kind == "in":
            self.next()
            items = self.parse_list_literal()
            return ensure_column(left, "operand").isin(*items)
        return left

    def parse_add(self) -> Column:
        left = self.parse_mul()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("+", "-"):
                self.next()
                left = ensure_column(left, "operand")
                right = ensure_column(self.parse_mul(), "operand")
                left = left + right if t.text == "+" else left - right
            else:
                return left

    def parse_mul(self) -> Column:
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("*", "/", "%"):
                self.next()
                left = ensure_column(left, "operand")
                right = ensure_column(self.parse_unary(), "operand")
                left = (
                    left * right if t.text == "*"
                    else left / right if t.text == "/"
                    else left % right
                )
            else:
                return left

    def parse_unary(self) -> Column:
        if self.accept("op", "-"):
            return -ensure_column(self.parse_unary(), "operand")
        return self.parse_postfix()

    def parse_postfix(self) -> Column:
        col = self.parse_primary()
        while True:
            if self.accept("op", "["):
                col = ensure_column(col, "indexed value")
                idx = ensure_column(self.parse_expr(), "index")
                self.expect("op", "]")
                col = col[idx]
            elif self.peek().kind == "op" and self.peek().text == ".":
                # only valid after a path/record expression; Column[field]
                self.next()
                field = self.expect("ident").text
                col = ensure_column(col, "dereferenced value")[field]
            else:
                return col

    def parse_list_literal(self) -> list:
        self.expect("op", "[")
        items = []
        if not self.accept("op", "]"):
            while True:
                items.append(self._literal_value())
                if self.accept("op", "]"):
                    break
                self.expect("op", ",")
        return items

    def _literal_value(self):
        t = self.next()
        if t.kind == "string":
            return t.text[1:-1].encode().decode("unicode_escape")
        if t.kind == "int":
            return int(t.text)
        if t.kind == "float":
            return float(t.text)
        raise ZedSyntaxError(f"expected literal in list, got {t.text!r}")

    def parse_primary(self) -> Column:
        t = self.peek()
        if t.kind == "string":
            self.next()
            return F.lit(t.text[1:-1].encode().decode("unicode_escape"))
        if t.kind == "int":
            self.next()
            return F.lit(int(t.text)).cast("long")
        if t.kind == "duration":
            self.next()
            return _Duration(_duration_micros(t.text))
        if t.kind == "float":
            self.next()
            return F.lit(float(t.text))
        if t.kind == "null":
            self.next()
            return F.lit(None)
        if t.kind == "true":
            self.next()
            return F.lit(True)
        if t.kind == "false":
            self.next()
            return F.lit(False)
        if t.kind == "this":
            self.next()
            if self.ctx.default_root is not None:
                return self.ctx.default_root
            return F.struct("*")
        if t.kind == "op" and t.text == "{":
            return self.parse_record()
        if t.kind == "op" and t.text == "|" and self.toks[self.i + 1].text == "{":
            return self.parse_map_literal()
        if t.kind == "op" and t.text == "[":
            self.next()
            items = []
            if not self.accept("op", "]"):
                while True:
                    items.append(self.parse_expr())
                    if self.accept("op", "]"):
                        break
                    self.expect("op", ",")
            return F.array(*items)
        if t.kind == "op" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.expect("op", ")")
            return e
        if t.kind == "ident" or t.kind == "in":
            # `in` doubles as the stateless-rule root identifier in the
            # reference's snippets (etl/build.go:171: yield {in:this});
            # a binary `in` never starts an expression, so this is safe.
            return self.parse_ident_or_call()
        raise ZedSyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def parse_map_literal(self) -> Column:
        """Zed map literal ``|{"k": v, ...}|`` → create_map. The idiomatic
        scale note from the reference docs applies: a small const map used
        as a lookup (demo/etl.zed:15) compiles to a literal expression, so
        it broadcasts with the plan — no join, no shuffle."""
        self.expect("op", "|")
        self.expect("op", "{")
        pairs: list[Column] = []
        if not self.accept("op", "}"):
            while True:
                k = self.parse_expr()
                self.expect("op", ":")
                pairs.extend([k, self.parse_expr()])
                if self.accept("op", "}"):
                    break
                self.expect("op", ",")
        self.expect("op", "|")
        return F.create_map(*pairs)

    def parse_record(self) -> Column:
        self.expect("op", "{")
        fields = []
        if not self.accept("op", "}"):
            while True:
                nt = self.next()
                if nt.kind not in ("ident", "in", "this") and nt.kind not in _KEYWORDS:
                    raise ZedSyntaxError(f"expected field name, got {nt.text!r} at {nt.pos}")
                name = nt.text
                self.expect("op", ":")
                self._fstack.append(name)
                v = self.parse_expr()
                if isinstance(v, _TaggedRecord):
                    # value position: the SHAPE stays in the struct; the
                    # tag survives out-of-band as a path decoration
                    # (registry model — Spark cannot nest the tag itself)
                    self.ctx.names_sink[".".join(self._fstack)] = v.name
                    v = v.col
                self._fstack.pop()
                fields.append(v.alias(name))
                if self.accept("op", "}"):
                    break
                self.expect("op", ",")
        return F.struct(*fields)

    def parse_ident_or_call(self) -> Column:
        t = self.next()
        if t.kind not in ("ident", "in"):
            raise ZedSyntaxError(f"expected identifier, got {t.text!r} at {t.pos}")
        name = t.text
        if self.peek().kind == "op" and self.peek().text == "(":
            return self.parse_call(name)
        # dotted path
        path = [name]
        while (
            self.peek().kind == "op"
            and self.peek().text == "."
            and self.toks[self.i + 1].kind == "ident"
        ):
            self.next()
            path.append(self.expect("ident").text)
        return self.ctx.resolve(path)

    def _parse_path_only(self) -> list[str]:
        t = self.next()
        if t.kind not in ("ident", "in"):
            raise ZedSyntaxError(f"expected path, got {t.text!r} at {t.pos}")
        path = [t.text]
        while self.accept("op", "."):
            path.append(self.expect("ident").text)
        return path

    def parse_call(self, name: str) -> Column:
        self.expect("op", "(")
        if name == "typeof":
            if self.peek().kind == "this":
                # typeof(this) — the record's runtime type, used as a group
                # key (`count() by typeof(this)`, design.md:160 — the
                # "shapes" idiom). In the envelope model a row's named type
                # IS the zed_type discriminator; untagged rows are plain
                # records.
                self.next()
                self.expect("op", ")")
                if (self.ctx.schema is not None
                        and "zed_type" not in self.ctx.schema.names):
                    return F.lit("record")
                return F.coalesce(F.col("zed_type"), F.lit("record"))
            path = self._parse_path_only()
            self.expect("op", ")")
            # typeof() on a path: a sentinel carrying the Spark type AND,
            # when the path is decorated in the registry (Context
            # path_names), the zed type name. As a cast() target it
            # re-coerces (and re-TAGS when named); in a value position a
            # NAMED path renders its decoration (ensure_column) — the
            # `count() by typeof(x)` shapes idiom over nested named types.
            return _TypeOf(self.ctx.resolve_type(path),
                           self.ctx.path_names.get(".".join(path)))
        if name == "cast":
            arg = self.parse_expr()
            self.expect("op", ",")
            t = self.peek()
            if t.kind == "ident" and t.text == "typeof":
                self.next()
                target = self.parse_call("typeof")
                self.expect("op", ")")
                if isinstance(target, _TypeOf) and target.name:
                    # the source path is decorated: the cast re-tags
                    return _TaggedRecord(arg.cast(target.dtype),
                                         target.dtype, target.name)
                return arg.cast(target.dtype)
            type_name = self.expect("ident").text
            self.expect("op", ")")
            if type_name in self.ctx.named_types:
                # cast to a DECLARED named type (type done = {...};
                # etl/build.go:181 `cast({kafka:...}, done)`): coerce to the
                # declared shape and remember the name — a top-level yield
                # turns the name into the zed_type discriminator column.
                dtype = self.ctx.named_types[type_name]
                return _TaggedRecord(arg.cast(dtype), dtype, type_name)
            prims = _zed_prim_types()
            if type_name in prims:
                # zed primitive names (cast(x, int64), SURVEY §1.3 bridge)
                return arg.cast(prims[type_name])
            return arg.cast(type_name)
        if name in ("shape", "fill", "crop", "order"):
            # zed's shaper trio + shape (public zed shaping docs): BY-NAME
            # record reshaping against a declared type — distinct from
            # cast(), whose struct→struct coercion is POSITIONAL.
            #   shape(e, T): exactly T's fields in T's order; present
            #     source fields cast by name (recursing into nested
            #     records), absent ones null — and the value is TAGGED
            #     with T (a top-level yield expands it + zed_type).
            #   fill(e, T):  source fields, then T-only fields as nulls.
            #   crop(e, T):  source fields that exist in T, source types.
            #   order(e, T): T∩source in T's order, then the rest.
            # The record argument must be `this` or a record path (the
            # source shape must be known at compile time).
            if self.peek().kind == "this":
                self.next()
                src_path: list[str] = []
            else:
                src_path = self._parse_path_only()
            self.expect("op", ",")
            tname = self.expect("ident").text
            self.expect("op", ")")
            if tname not in self.ctx.named_types:
                raise ZedSyntaxError(
                    f"{name}(): unknown type {tname!r} (declare it with "
                    f"`type {tname} = {{...}}`)")
            dtype = self.ctx.named_types[tname]
            if not isinstance(dtype, StructType):
                raise ZedSyntaxError(f"{name}(): {tname} is not a record type")
            src_type = self.ctx.resolve_type(src_path)
            if not isinstance(src_type, StructType):
                raise ZedSyntaxError(
                    f"{name}(): {'.'.join(src_path) or 'this'} is not a record")

            def get(fname: str) -> Column:
                return self.ctx.resolve(src_path + [fname])

            col = F.struct(*_shape_cols(name, src_type, dtype, get))
            if name == "shape":
                return _TaggedRecord(col, dtype, tname)
            return col
        if name in ("has", "missing"):
            # zed has(<path>)/missing(<path>): field-presence predicates.
            # Zed evaluates them per-value over heterogeneous data; in the
            # unified-schema model presence is a property of the frame's
            # schema, so they resolve at COMPILE time to a boolean literal
            # (and Catalyst constant-folds the branch away).
            path = self._parse_path_only()
            self.expect("op", ")")
            try:
                self.ctx.resolve_type(path)
                present = True
            except (ZedSyntaxError, KeyError):
                if self.ctx.schema is None:
                    raise
                present = False
            return F.lit(present if name == "has" else not present)
        if name == "bucket":
            # bucket(<time expr>, <duration literal>) — zed stdlib. Truncate
            # to the duration grid: pure epoch-micros arithmetic, no UDF.
            # (Floor-toward-zero on the epoch; testdata is post-1970.)
            ts = self.parse_expr()
            self.expect("op", ",")
            d = self.parse_expr()
            self.expect("op", ")")
            if isinstance(d, _Duration):
                micros = F.lit(d.micros)
            else:  # numeric expression = seconds
                micros = (d * 1_000_000).cast("long")
            us = F.unix_micros(ts)
            return F.timestamp_micros(us - us % micros)
        if name == "is":
            # is([path,] <T>) — zed named-type predicate (design.md:342,
            # demo/pending.zed:4, demo/update.zed:3). In the envelope model
            # a TOP-LEVEL value's named type lives in the ``zed_type``
            # discriminator column (envelope.py), so the this-form
            # compiles to a null-safe comparison (rows null-padded by
            # schema widening are data, not markers); a frame with no
            # discriminator holds no named-typed values, so is(<T>) there
            # is statically false and Catalyst constant-folds the branch.
            # The PATH form (zed's two-arg is) tests a NESTED value's
            # decoration against the path registry (Context.path_names):
            # decorations are frame-level in the unified-schema model, so
            # the predicate folds to a constant — exactly as precise as
            # the registry that carries the nested tags.
            path: list[str] | None = None
            t = self.peek()
            if not (t.kind == "op" and t.text == "<"):
                if t.kind == "this":
                    self.next()
                else:
                    path = self._parse_path_only()
                self.expect("op", ",")
            self.expect("op", "<")
            tname = self.expect("ident").text
            self.expect("op", ">")
            self.expect("op", ")")
            if path is not None:
                return F.lit(self.ctx.path_names.get(".".join(path)) == tname)
            if (self.ctx.schema is not None
                    and "zed_type" not in self.ctx.schema.names):
                return F.lit(False)
            return F.col("zed_type").eqNullSafe(F.lit(tname))
        if name == "every":
            # every(<duration>) — zed's time-bucket grouping sugar
            # (`count() by every(1h)`): bucket(this.ts, d) on the
            # conventional `ts` field.
            d = self.parse_expr()
            self.expect("op", ")")
            if not isinstance(d, _Duration):
                raise ZedSyntaxError("every() takes a duration literal (1h, 15m, ...)")
            ts = self.ctx.resolve(["ts"])
            us = F.unix_micros(ts)
            return F.timestamp_micros(us - us % F.lit(d.micros))
        if name == "strftime":
            # strftime(<format literal>, <time expr>) — format must be a
            # literal so the %-codes convert at compile time.
            t = self.expect("string")
            fmt = t.text[1:-1].encode().decode("unicode_escape")
            self.expect("op", ",")
            ts = self.parse_expr()
            self.expect("op", ")")
            return F.date_format(ts, strftime_to_java(fmt))
        args = []
        if not self.accept("op", ")"):
            while True:
                args.append(self.parse_expr())
                if self.accept("op", ")"):
                    break
                self.expect("op", ",")
        if name not in _FUNCTIONS:
            raise ZedSyntaxError(f"unknown function {name!r}")
        return _FUNCTIONS[name](args)


class _TypeOf:
    """Sentinel produced by typeof(<path>): the path's Spark type plus its
    registry decoration (zed type name) when one exists. Valid as a
    cast() target always; valid as a VALUE only when named (it renders
    the decoration — an unnamed nested type has no zed-value rendering
    in the unified-schema model)."""

    def __init__(self, dtype: DataType, name: str | None = None):
        self.dtype = dtype
        self.name = name


def _shape_coerce(col: Column, src_t, tgt_t) -> Column:
    """Field-level coercion for shape(): recurse BY NAME into nested
    records (a bare struct cast is positional and silently misaligns);
    everything else is a plain cast."""
    if isinstance(src_t, StructType) and isinstance(tgt_t, StructType):
        src_names = {f.name: f.dataType for f in src_t.fields}
        return F.struct(*[
            (_shape_coerce(col[f.name], src_names[f.name], f.dataType)
             if f.name in src_names
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in tgt_t.fields
        ])
    return col.cast(tgt_t)


def _shape_cols(kind: str, src_type: StructType, dtype: StructType,
                get) -> list[Column]:
    src_names = {f.name: f.dataType for f in src_type.fields}
    tgt = {f.name: f.dataType for f in dtype.fields}
    if kind == "shape":
        return [
            (_shape_coerce(get(f.name), src_names[f.name], f.dataType)
             if f.name in src_names
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in dtype.fields
        ]
    if kind == "fill":
        return ([get(n).alias(n) for n in src_names]
                + [F.lit(None).cast(t).alias(n)
                   for n, t in tgt.items() if n not in src_names])
    if kind == "crop":
        return [get(n).alias(n) for n in src_names if n in tgt]
    # order
    return ([get(f.name).alias(f.name) for f in dtype.fields
             if f.name in src_names]
            + [get(n).alias(n) for n in src_names if n not in tgt])


class _TaggedRecord:
    """Sentinel produced by cast(expr, <declared named type>): the value
    coerced to the declared shape, remembering the type NAME. Sinks that
    understand the tag: a top-level ``yield`` (fields expand to columns +
    a zed_type discriminator, envelope model) and value positions
    (record-literal fields, assignments), which keep the coerced value in
    the struct and record the tag as a PATH DECORATION in the context's
    names_sink (the registry that carries nested named types the unified
    schema cannot, SURVEY §1.2 — round 4; persisted via
    Pool.load(type_names=), read back via Context(path_names=)).
    Arithmetic/comparison on a named-type value is a syntax error, as in
    zed."""

    def __init__(self, col: Column, dtype: DataType, name: str):
        self.col = col
        self.dtype = dtype
        self.name = name

    def _bad(self, *_a, **_k):
        raise ZedSyntaxError(
            "a named-type cast is only valid as a yield target or a value")

    __add__ = __radd__ = __sub__ = __rsub__ = __mul__ = __rmul__ = _bad
    __truediv__ = __rtruediv__ = __mod__ = __rmod__ = __neg__ = _bad
    __and__ = __rand__ = __or__ = __ror__ = __invert__ = _bad
    __eq__ = __ne__ = __lt__ = __le__ = __gt__ = __ge__ = _bad  # type: ignore[assignment]
    __hash__ = None  # type: ignore[assignment]


# zed primitive type names → Spark types (SURVEY §1.3 bridge table; the
# subset declarable in `type` prologues).
def _zed_prim_types():
    from pyspark.sql import types as T

    return {
        "string": T.StringType(), "bool": T.BooleanType(),
        "int8": T.ByteType(), "int16": T.ShortType(),
        "int32": T.IntegerType(), "int64": T.LongType(),
        "uint8": T.ShortType(), "uint16": T.IntegerType(),
        "uint32": T.LongType(), "uint64": T.LongType(),
        "float16": T.FloatType(), "float32": T.FloatType(),
        "float64": T.DoubleType(), "time": T.TimestampType(),
        "duration": T.LongType(), "bytes": T.BinaryType(),
    }


def parse_type_literal(p: Parser) -> DataType:
    """Parse a zed type literal: `{f:T,...}`, `[T]`, a primitive name, or
    a previously declared named type."""
    from pyspark.sql import types as T

    t = p.next()
    if t.kind == "op" and t.text == "{":
        fields = []
        if not p.accept("op", "}"):
            while True:
                nt = p.next()
                if not nt.text.isidentifier():
                    raise ZedSyntaxError(
                        f"expected field name in type, got {nt.text!r} at {nt.pos}")
                p.expect("op", ":")
                fields.append(T.StructField(nt.text, parse_type_literal(p)))
                if p.accept("op", "}"):
                    break
                p.expect("op", ",")
        return T.StructType(fields)
    if t.kind == "op" and t.text == "[":
        elem = parse_type_literal(p)
        p.expect("op", "]")
        return T.ArrayType(elem)
    prims = _zed_prim_types()
    if t.kind == "ident" and t.text in prims:
        return prims[t.text]
    if t.kind == "ident" and t.text in p.ctx.named_types:
        return p.ctx.named_types[t.text]
    raise ZedSyntaxError(f"unknown type {t.text!r} at {t.pos}")


class _Duration:
    """Sentinel for a zed duration literal (1h, 30m, …) — valid only as the
    second argument of bucket(); anywhere else is a syntax error."""

    def __init__(self, micros: int):
        self.micros = micros

    def _bad(self, *_a, **_k):
        raise ZedSyntaxError("duration literal is only valid inside bucket()")

    __add__ = __radd__ = __sub__ = __rsub__ = __mul__ = __rmul__ = _bad
    __truediv__ = __rtruediv__ = __mod__ = __rmod__ = __neg__ = _bad
    __eq__ = __ne__ = __lt__ = __le__ = __gt__ = __ge__ = _bad  # type: ignore[assignment]
    __hash__ = None  # type: ignore[assignment]


def strip_const_prologue(src: str, ctx: Context) -> str:
    """Parse a leading ``const name = expr[;]`` / ``type name = <type>[;]``
    prologue (demo/etl.zed:1-9, ztests/etl-zed.yaml:10), binding constants
    as root Columns and type declarations as named types in `ctx`, and
    return the remaining source. Lookups like
    ``customerIDs[records[0].value.row.customer]`` then resolve through the
    normal path machinery; ``cast(x, name)`` / ``is(<name>)`` see the
    declared types."""
    toks = tokenize(src)
    p = Parser(toks, ctx)
    while p.peek().kind == "ident" and p.peek().text in ("const", "type"):
        kind = p.next().text
        name = p.expect("ident").text
        p.expect("op", "=")
        if kind == "const":
            ctx.roots[name] = p.parse_expr()
        else:
            ctx.named_types[name] = parse_type_literal(p)
        while p.accept("op", ";"):
            pass
    return src[p.peek().pos:]


def ensure_column(col, where: str = "expression") -> Column:
    """Reject parser sentinels that escaped to a Column position (a bare
    duration literal as a predicate, typeof() outside cast()) with a
    syntax error instead of a deep PySpark type error; unwrap a
    named-type cast to its coerced value."""
    if isinstance(col, _TypeOf):
        if col.name:
            return F.lit(col.name)  # decorated path: render the type name
        raise ZedSyntaxError(
            "typeof() on an UNNAMED path is only valid inside cast(); "
            "decorate the path (pool types.json / cast-to-named) to use "
            "it as a value")
    if isinstance(col, _Duration):
        raise ZedSyntaxError(
            f"duration literal is only valid inside bucket()/every(), "
            f"not as a {where}")
    if isinstance(col, _TaggedRecord):
        return col.col
    return col


def compile_expr(src: str, ctx: Context) -> Column:
    """Compile one zed expression to a Column (const prologue allowed)."""
    src = strip_const_prologue(src, ctx)
    p = Parser(tokenize(src), ctx)
    col = p.parse_expr()
    p.expect("eof")
    return ensure_column(col)


def compile_assignments(src: str, ctx: Context) -> dict[str, Column]:
    """Compile a zed snippet of the form used in ETL YAML:
    ``| name := expr | other := expr`` → {name: Column}.

    Leading pipes are cosmetic in the reference's YAML (spliced into a
    larger program, etl/build.go:172-173); nested-path targets (a.b := e)
    are returned as dotted names for the caller to apply via withField.
    A ``const`` prologue is allowed before the first assignment.
    """
    src = strip_const_prologue(src, ctx)
    toks = tokenize(src)
    p = Parser(toks, ctx)
    out: dict[str, Column] = {}
    while p.accept("op", "|"):
        pass
    while p.peek().kind != "eof":
        path = p._parse_path_only()
        p.expect("assign")
        # value position: named-type casts keep the coerced value, and
        # the tag survives as a path decoration in the context's sink;
        # the target path seeds the field stack so tags nested inside a
        # record literal decorate their ABSOLUTE path
        p._fstack.extend(path)
        v = p.parse_expr()
        del p._fstack[len(p._fstack) - len(path):]
        if isinstance(v, _TaggedRecord):
            ctx.names_sink[".".join(path)] = v.name
            v = v.col
        out[".".join(path)] = ensure_column(v, "assigned value")
        while p.accept("op", "|"):
            pass
    return out
