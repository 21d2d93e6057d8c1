"""Additional RDF interchange formats: TriG, JSON-LD, RDF/XML (SURVEY.md §2.2).

Reference analog: the RIO parser registry (bigdata-core/bigdata-rdf/src/java/
com/bigdata/rdf/rio/ — the reference accepts RDF/XML, TriG, and JSON-LD
through openrdf RIO). These three are document-scoped syntaxes (graph blocks,
JSON documents, XML trees), so unlike N-Triples they cannot be split inside a
file: parallelism is per FILE. The loaders read with ``wholetext`` and parse
each document in an Arrow-batched ``mapInPandas`` stage — a directory of
shard files (the normal bulk-load layout at scale) parallelizes across the
cluster, one document per task slot.

Each parser covers the practical subset produced by common exporters; the
docstrings state the exact coverage. Lang-tagged literals carry
``o_dt='lang:<tag>'``; typed literals map onto the engine's dt tags.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from blazegraph_database_spark.sources.ntriples import _XSD_DT

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_TRIPLES_SCHEMA = "s string, p string, o_lex string, o_dt string"
_QUADS_SCHEMA = _TRIPLES_SCHEMA + ", g string"

_TERM_RE = re.compile(
    r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^\S+)?|[A-Za-z0-9_-]*:[A-Za-z0-9_.-]+|a)'
)
_PREFIX_RE = re.compile(r"@prefix\s+([A-Za-z0-9_-]*):\s*<([^>]*)>")


def _expand_term(tok: str, prefixes: dict) -> tuple[str, str]:
    if tok == "a":
        return RDF_NS + "type", "iri"
    if tok.startswith("<"):
        return tok[1:-1], "iri"
    if tok.startswith("_:"):
        return tok, "bnode"
    if tok.startswith('"'):
        m = re.match(r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(\S+))?', tok)
        lex = m.group(1).replace('\\"', '"').replace("\\n", "\n").replace("\\t", "\t")
        if m.group(2):
            return lex, f"lang:{m.group(2)}"
        if m.group(3):
            dt_iri = m.group(3)
            if dt_iri.startswith("<"):
                dt_iri = dt_iri[1:-1]
            elif ":" in dt_iri:
                pfx, local = dt_iri.split(":", 1)
                dt_iri = prefixes.get(pfx, pfx + ":") + local
            return lex, _XSD_DT.get(dt_iri, "string")
        return lex, "string"
    pfx, local = tok.split(":", 1)
    return prefixes.get(pfx, pfx + ":") + local, "iri"


def _parse_trig_doc(doc: str) -> list[tuple]:
    """TriG subset: @prefix header, optional default-graph statements, and
    `[GRAPH] <g> { s p o . ... }` blocks. Returns (s,p,o_lex,o_dt,g) with
    g='' for the default graph."""
    prefixes = dict(_PREFIX_RE.findall(doc))
    out: list[tuple] = []
    # strip prefix lines; then walk graph blocks
    body = _PREFIX_RE.sub("", doc)
    pos = 0
    block_re = re.compile(
        r"(?:GRAPH\s+)?(<[^>]*>|[A-Za-z0-9_-]*:[A-Za-z0-9_.-]+)\s*\{(.*?)\}",
        re.DOTALL | re.IGNORECASE,
    )

    def statements(text: str, g: str):
        # tokenize the whole block (dots appear inside IRIs, so splitting on
        # "." is unsafe) and chunk tokens into s/p/o triples; statement
        # terminators ride along as trailing dots on pname tokens — strip them
        toks = []
        for t in _TERM_RE.findall(text):
            if not t.startswith('"') and not t.startswith("<"):
                t = t.rstrip(".")
            if t:
                toks.append(t)
        for i in range(0, len(toks) - 2, 3):
            (s, _), (p, _), (o, odt) = (
                _expand_term(toks[i], prefixes),
                _expand_term(toks[i + 1], prefixes),
                _expand_term(toks[i + 2], prefixes),
            )
            out.append((s, p, o, odt, g))

    for m in block_re.finditer(body):
        g, _ = _expand_term(m.group(1), prefixes)
        statements(m.group(2), g)
        pos = max(pos, m.end())
    # default-graph statements = everything outside blocks
    outside = block_re.sub("", body)
    statements(outside, "")
    return out


def _obj_term(v) -> tuple[str, str]:
    """JSON-LD value → (o_lex, o_dt)."""
    if isinstance(v, dict):
        if "@id" in v:
            return str(v["@id"]), "iri"
        if "@value" in v:
            lex = str(v["@value"])
            if "@language" in v:
                return lex, f"lang:{v['@language']}"
            if "@type" in v:
                return lex, _XSD_DT.get(v["@type"], "string")
            if isinstance(v["@value"], bool):
                return str(v["@value"]).lower(), "boolean"
            if isinstance(v["@value"], int):
                return lex, "long"
            if isinstance(v["@value"], float):
                return lex, "double"
            return lex, "string"
    if isinstance(v, bool):
        return str(v).lower(), "boolean"
    if isinstance(v, int):
        return str(v), "long"
    if isinstance(v, float):
        return str(v), "double"
    return str(v), "string"


def _parse_jsonld_doc(doc: str) -> list[tuple]:
    """JSON-LD subset: a node object or array of node objects (optionally
    under @graph), with an optional @context of simple term→IRI mappings.
    Covers flat expanded/compacted exports; no nested node recursion beyond
    one level of @graph, no @reverse/@container."""
    data = json.loads(doc)
    ctx = {}
    if isinstance(data, dict):
        raw_ctx = data.get("@context") or {}
        if isinstance(raw_ctx, dict):
            ctx = {k: v for k, v in raw_ctx.items() if isinstance(v, str)}
        nodes = data.get("@graph", [data] if "@id" in data else [])
    else:
        nodes = data

    def expand(term: str) -> str:
        if term in ctx:
            return ctx[term]
        if ":" in term:
            pfx, local = term.split(":", 1)
            if pfx in ctx:
                return ctx[pfx] + local
        return term

    out: list[tuple] = []
    for node in nodes:
        if not isinstance(node, dict) or "@id" not in node:
            continue
        s = str(node["@id"])
        for k, vals in node.items():
            if k.startswith("@") and k != "@type":
                continue
            if k == "@type":
                for t in vals if isinstance(vals, list) else [vals]:
                    out.append((s, RDF_NS + "type", expand(str(t)), "iri"))
                continue
            p = expand(k)
            for v in vals if isinstance(vals, list) else [vals]:
                if isinstance(v, dict) and "@id" in v:
                    out.append((s, p, expand(str(v["@id"])), "iri"))
                else:
                    lex, dt = _obj_term(v)
                    out.append((s, p, lex, dt))
    return out


def _parse_rdfxml_doc(doc: str) -> list[tuple]:
    """RDF/XML subset: rdf:Description (or typed-element) children of
    rdf:RDF, properties as child elements with rdf:resource, rdf:datatype,
    xml:lang, or text content. No rdf:parseType, no nested descriptions,
    no rdf:li expansion."""
    import xml.etree.ElementTree as ET

    def split_tag(tag: str) -> str:
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    root = ET.fromstring(doc)
    out: list[tuple] = []
    for desc in root:
        about = desc.get(f"{{{RDF_NS}}}about") or desc.get(f"{{{RDF_NS}}}nodeID")
        if about is None:
            continue
        s = about if not desc.get(f"{{{RDF_NS}}}nodeID") else f"_:{about}"
        tag = split_tag(desc.tag)
        if tag != RDF_NS + "Description":  # typed node element
            out.append((s, RDF_NS + "type", tag, "iri"))
        for prop in desc:
            p = split_tag(prop.tag)
            res = prop.get(f"{{{RDF_NS}}}resource")
            if res is not None:
                out.append((s, p, res, "iri"))
                continue
            lex = (prop.text or "").strip()
            dt_iri = prop.get(f"{{{RDF_NS}}}datatype")
            lang = prop.get("{http://www.w3.org/XML/1998/namespace}lang")
            if lang:
                out.append((s, p, lex, f"lang:{lang}"))
            elif dt_iri:
                out.append((s, p, lex, _XSD_DT.get(dt_iri, "string")))
            else:
                out.append((s, p, lex, "string"))
    return out


def _whole_docs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path, wholetext=True)


def _map_docs(docs: DataFrame, parse_fn, schema: str) -> DataFrame:
    cols = [c.split(" ")[0] for c in schema.split(", ")]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc in pdf["value"]:
                rows.extend(parse_fn(doc))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(run, schema)


def read_trig(spark: SparkSession, path: str) -> DataFrame:
    """TriG → (s, p, o_lex, o_dt, g); g='' for default-graph statements.
    One task per file — shard the export for cluster parallelism."""
    return _map_docs(_whole_docs(spark, path), _parse_trig_doc, _QUADS_SCHEMA)


def read_jsonld(spark: SparkSession, path: str) -> DataFrame:
    """JSON-LD (flat subset) → (s, p, o_lex, o_dt). One task per file."""
    return _map_docs(_whole_docs(spark, path), _parse_jsonld_doc, _TRIPLES_SCHEMA)


def read_rdfxml(spark: SparkSession, path: str) -> DataFrame:
    """RDF/XML (subset) → (s, p, o_lex, o_dt). One task per file."""
    return _map_docs(_whole_docs(spark, path), _parse_rdfxml_doc, _TRIPLES_SCHEMA)
