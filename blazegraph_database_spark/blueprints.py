"""Property-graph facade over the triple store (SURVEY.md §2.12 extension).

Reference analog: the Blueprints API adapter
(bigdata-blueprints/src/main/java/com/bigdata/blueprints/BigdataGraph.java:95)
— a thin vertex/edge/property view over RDF statements. Same mapping here:

* vertex `v`            → ``(v, rdf:type, pg:Vertex)``
* vertex property       → ``(v, pg:prop:<name>, value)`` typed literal
* edge out —label→ in   → ``(out, pg:edge:<label>, in)``
* edge property         → ``(<<out|pg:edge:l|in|iri>>, pg:prop:<name>, value)``
  — the RDF-star statement id the compiler's RDR machinery already joins on
  (BigdataGraph likewise stores edge properties on the statement via sids).

Everything is DataFrame-backed: reads are plain filters/joins over the
store's columns (predicate pushdown reaches the scan), writes go through
``UpdatableStore.insert_data`` so versioning/snapshot isolation apply
unchanged. Traversals (out/in/both) are one equi-join each — at scale they
inherit the store's predicate partitioning, and multi-hop traversals can
hand off to operators/gas for the iterative cases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blazegraph_database_spark.model.store import TRIPLE_COLS, TripleStore
from blazegraph_database_spark.update.update import UpdatableStore

VERTEX_TYPE = "pg:Vertex"
PROP_NS = "pg:prop:"
EDGE_NS = "pg:edge:"
RDF_TYPE = "rdf:type"

_DT_OF = {int: "long", float: "double", bool: "boolean"}


def _lit(v) -> tuple[str, str]:
    if isinstance(v, bool):  # before int: bool is an int subclass
        return ("true" if v else "false"), "boolean"
    return str(v), _DT_OF.get(type(v), "string")


def _edge_sid(out_v: str, label: str, in_v: str) -> str:
    """Statement id of the edge triple — matches plans/compiler.sid_expr."""
    return f"<<{out_v}|{EDGE_NS}{label}|{in_v}|iri>>"


class PropertyGraph:
    """Blueprints-style facade: addVertex/addEdge/properties/traversals."""

    def __init__(self, store: UpdatableStore | TripleStore):
        self.store = (
            store if isinstance(store, UpdatableStore) else UpdatableStore.from_store(store)
        )

    @property
    def df(self) -> DataFrame:
        return self.store.current.df

    @property
    def spark(self):
        return self.store.current.spark

    def _insert(self, rows: list[tuple]) -> None:
        self.store.insert_data(
            self.spark.createDataFrame(rows, ", ".join(f"{c} string" for c in TRIPLE_COLS))
        )

    # ------------------------------------------------------------- writes --
    def add_vertex(self, vid: str, **props) -> str:
        rows = [(vid, RDF_TYPE, VERTEX_TYPE, "iri")]
        rows += [(vid, PROP_NS + k, *_lit(v)) for k, v in props.items()]
        self._insert(rows)
        return vid

    def add_edge(self, out_v: str, label: str, in_v: str, **props) -> str:
        rows = [(out_v, EDGE_NS + label, in_v, "iri")]
        sid = _edge_sid(out_v, label, in_v)
        rows += [(sid, PROP_NS + k, *_lit(v)) for k, v in props.items()]
        self._insert(rows)
        return sid

    def remove_edge(self, out_v: str, label: str, in_v: str) -> None:
        sid = _edge_sid(out_v, label, in_v)
        doomed = self.df.filter(
            ((F.col("s") == out_v) & (F.col("p") == EDGE_NS + label) & (F.col("o_lex") == in_v))
            | (F.col("s") == sid)  # edge properties ride along
        )
        self.store.delete_data(doomed.select(*TRIPLE_COLS))

    # -------------------------------------------------------------- reads --
    def vertices(self) -> DataFrame:
        """(id) of every vertex."""
        return self.df.filter(
            (F.col("p") == RDF_TYPE) & (F.col("o_lex") == VERTEX_TYPE)
        ).select(F.col("s").alias("id"))

    def vertex_properties(self, vid: str | None = None) -> DataFrame:
        """(id, name, value, dt) vertex property rows."""
        out = self.df.filter(
            F.col("p").startswith(PROP_NS) & ~F.col("s").startswith("<<")
        ).select(
            F.col("s").alias("id"),
            F.expr(f"substring(p, {len(PROP_NS) + 1})").alias("name"),
            F.col("o_lex").alias("value"),
            F.col("o_dt").alias("dt"),
        )
        return out.filter(F.col("id") == vid) if vid is not None else out

    def vertex(self, vid: str) -> dict:
        """Property dict of one vertex (driver-side convenience accessor)."""
        return {r["name"]: r["value"] for r in self.vertex_properties(vid).collect()}

    def edges(self, label: str | None = None) -> DataFrame:
        """(out, label, in) edge rows."""
        pred = F.col("p") == EDGE_NS + label if label else F.col("p").startswith(EDGE_NS)
        return self.df.filter(pred).select(
            F.col("s").alias("out"),
            F.expr(f"substring(p, {len(EDGE_NS) + 1})").alias("label"),
            F.col("o_lex").alias("in"),
        )

    def edge_properties(self, out_v: str, label: str, in_v: str) -> dict:
        sid = _edge_sid(out_v, label, in_v)
        rows = self.df.filter((F.col("s") == sid) & F.col("p").startswith(PROP_NS)).select(
            F.expr(f"substring(p, {len(PROP_NS) + 1})").alias("name"), "o_lex"
        )
        return {r["name"]: r["o_lex"] for r in rows.collect()}

    def out_neighbors(self, vid: str, label: str | None = None) -> DataFrame:
        return self.edges(label).filter(F.col("out") == vid).select(F.col("in").alias("id"))

    def in_neighbors(self, vid: str, label: str | None = None) -> DataFrame:
        return self.edges(label).filter(F.col("in") == vid).select(F.col("out").alias("id"))

    def both_neighbors(self, vid: str, label: str | None = None) -> DataFrame:
        return self.out_neighbors(vid, label).unionByName(self.in_neighbors(vid, label)).distinct()

    def degrees(self, direction: str = "out") -> DataFrame:
        """(id, degree) for every vertex with at least one edge."""
        e = self.edges()
        key = {"out": ["out"], "in": ["in"]}.get(direction)
        if key is None:  # both
            e = e.select(F.col("out").alias("v")).unionByName(e.select(F.col("in").alias("v")))
            key = ["v"]
        else:
            e = e.select(F.col(key[0]).alias("v"))
        return e.groupBy(F.col("v").alias("id")).agg(F.count(F.lit(1)).alias("degree"))

    # -------------------------------------------------------- integrations --
    def as_gas_edges(self, label: str | None = None) -> DataFrame:
        """(src, dst) edge list for operators/gas (BFS/SSSP/CC/PageRank)."""
        return self.edges(label).select(F.col("out").alias("src"), F.col("in").alias("dst"))
