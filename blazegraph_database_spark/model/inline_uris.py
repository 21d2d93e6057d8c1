"""Inline-URI handlers: packed, VALUE-ORDERED keys for URIs whose local
name is a scalar (ref: bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/
internal/InlineURIFactory.java — pre-loaded IPv4 + UUID handlers keyed by
namespace prefix, longest-prefix dispatch, app-extensible;
InlineIPv4URIHandler.java packs `urn:ipv4:a.b.c.d` into a fixed-width IV so
IP range scans run in VALUE order, InlineUUIDURIHandler.java packs
`urn:uuid:...`).

Spark-first: no custom storage format — the handler contributes a pure
EXPRESSION mapping the URI string column to an orderable native value, so a
range FILTER over handler URIs compiles to a native numeric comparison
(whole-stage codegen, parquet-pushdown-eligible) instead of a string
compare. The SPARQL layer applies it automatically: `?ip > <urn:ipv4:...>`
in a FILTER takes the packed view when the constant's prefix has a handler
(lexicographic order on dotted quads is WRONG — "10.9.0.0" > "10.10.0.0").

Like the reference, handlers MUST be registered before data-dependent use;
registration is process-global.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (namespace prefix, kind); kind in {"ipv4", "integer", "uuid"}. Dispatch is
# longest-prefix, mirroring InlineURIHandler's prefix contract.
_HANDLERS: dict[str, str] = {
    "urn:ipv4:": "ipv4",
    "urn:uuid:": "uuid",
}


def register_inline_uri_handler(namespace: str, kind: str) -> None:
    """The InlineURIFactory extension point: app-declared handlers (ref:
    InlineURIFactory docstring — 'You MAY declare additional handlers')."""
    if kind not in ("ipv4", "integer", "uuid"):
        raise ValueError(f"unknown inline-URI kind {kind!r}")
    _HANDLERS[namespace] = kind


def handler_for(iri: str) -> tuple[str, str] | None:
    """(namespace, kind) of the longest registered prefix, else None."""
    best = None
    for ns, kind in _HANDLERS.items():
        if iri.startswith(ns) and (best is None or len(ns) > len(best[0])):
            best = (ns, kind)
    return best


def pack_py(iri: str) -> int | None:
    """Driver-side pack of a handler URI to its orderable long (constants
    in FILTER expressions). None when unparseable or orderless (uuid)."""
    h = handler_for(iri)
    if h is None:
        return None
    ns, kind = h
    local = iri[len(ns):]
    if kind == "ipv4":
        parts = local.split(".")
        if len(parts) != 4:
            return None
        try:
            vals = [int(p) for p in parts]
        except ValueError:
            return None
        if any(not 0 <= v <= 255 for v in vals):
            return None
        return ((vals[0] * 256 + vals[1]) * 256 + vals[2]) * 256 + vals[3]
    if kind == "integer":
        try:
            return int(local)
        except ValueError:
            return None
    return None  # uuid: compact identity, no meaningful value order


def inline_key(col: Column, namespace: str, kind: str) -> Column:
    """Executor-side pack: URI string column → orderable long (NULL when
    the row's value isn't a parseable handler URI — a per-row type error,
    so an enclosing FILTER drops it, matching open-world comparison
    semantics)."""
    local = F.when(col.startswith(namespace), F.substring(col, len(namespace) + 1, 1 << 20))
    if kind == "ipv4":
        ok = local.rlike(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
        a = F.regexp_extract(local, r"^(\d+)\.(\d+)\.(\d+)\.(\d+)$", 1).try_cast("long")
        b = F.regexp_extract(local, r"^(\d+)\.(\d+)\.(\d+)\.(\d+)$", 2).try_cast("long")
        c = F.regexp_extract(local, r"^(\d+)\.(\d+)\.(\d+)\.(\d+)$", 3).try_cast("long")
        d = F.regexp_extract(local, r"^(\d+)\.(\d+)\.(\d+)\.(\d+)$", 4).try_cast("long")
        key = ((a * 256 + b) * 256 + c) * 256 + d
        in_range = (a <= 255) & (b <= 255) & (c <= 255) & (d <= 255)
        return F.when(ok & in_range, key)
    if kind == "integer":
        return local.try_cast("long")
    raise ValueError(f"kind {kind!r} has no value order")
