"""Triple/quad store over a DataFrame.

Reference analog: com.bigdata.rdf.store.AbstractTripleStore + the SPO/POS/OSP
B+Tree indices (bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/spo/).
Spark-first: one columnar table ``(s, p, o_lex, o_dt[, g])``. The POS index's
role (fast lookup by predicate) is played by disk partitioning on ``p`` plus
Catalyst partition pruning; per-predicate stats drive BGP join ordering the
way the reference's B+Tree range counts drive its static join optimizer
(reference: bigdata-core/bigdata-rdf/.../sparql/ast/optimizers/ASTStaticJoinOptimizer.java).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_COLS = ["s", "p", "o_lex", "o_dt"]


def _accepts_kwarg(fn, name: str) -> bool:
    """Capability probe by signature — never by trial call, which would
    swallow genuine TypeErrors from inside the factory and run it twice."""
    import inspect

    try:
        return name in inspect.signature(fn).parameters
    except (TypeError, ValueError):  # builtins/partials without signatures
        return False


@dataclass
class PredStat:
    count: int
    n_distinct_s: int
    n_distinct_o: int


class TripleStore:
    """An immutable triple set. ``df`` has columns s,p,o_lex,o_dt[,g].

    ``pred_sources`` optionally maps a predicate to a factory producing that
    predicate's triples directly from its base storage — the virtual-index
    fast path. A constant-predicate BGP pattern then compiles to a narrow
    column-pruned scan of the base parquet (predicate pushdown reaches the
    reader) instead of a filter over the melted union — the true POS-index
    analog, and the difference between scanning one column of one table and
    scanning every triple at 100 TB. The melted ``df`` remains the general
    path (variable predicates, CONSTRUCT output, closure results); when a
    ``df_factory`` is given, that union view is built only on first access,
    so stores whose queries stay on the virtual indices never pay for it.
    """

    def __init__(
        self,
        df: DataFrame | None = None,
        _stats: dict[str, PredStat] | None = None,
        pred_sources: dict | None = None,
        df_factory=None,
        star_factory=None,
        pred_table: dict | None = None,
        pred_dt: dict | None = None,
    ):
        if df is None and df_factory is None:
            raise ValueError("TripleStore needs df or df_factory")
        self._df = df
        self._df_factory = df_factory
        self._stats = _stats
        # Whether per-predicate counts in _stats are EXACT (safe to answer
        # COUNT(*) / ESTCARD from; ref: fast range counts are exact in the
        # reference's B+Tree). Lazily-computed stats are exact; injected
        # stats default to estimates until the injector marks them.
        self._stats_exact = _stats is None
        self.pred_sources = pred_sources
        # Star-fusion hooks (see plans/compiler._compile_bgp): pred_table maps
        # predicate → base table; star_factory([preds]) returns one scan with
        # columns ("s", <pred>, ...) when all preds live in that one table.
        self.star_factory = star_factory
        self.pred_table = pred_table
        self.pred_dt = pred_dt  # predicate → o_dt tag (constant per predicate)
        # When True, the compiler binds a companion `<var>__dt` column for
        # object-position variables so CONSTRUCT/UPDATE preserve term type
        # (ref keeps IV type through construct; see ADVICE round 1).
        self.track_dt = False
        # Vars the compiler binds as 128-bit term ids (`<var>__id`) instead of
        # lexical strings — set per-query by plans/compiler.evaluate (the
        # TERM2ID join discipline; ref: lexicon/LexiconRelation.java).
        self.id_join_vars: frozenset = frozenset()
        # Vars the compiler binds with their NATIVE column type (long/double)
        # instead of the lexical string — set per-query by
        # plans/compiler.evaluate for vars consumed only through typed casts
        # (the inline-IV analog: the reference stores numerics inline in the
        # IV, never round-tripping through the lexicon; ref:
        # internal/impl/literal/XSDNumericIV.java). Maps var -> dt tag.
        self.native_typed_vars: dict = {}
        # FROM / FROM NAMED scoping (None = no dataset declared)
        self.dataset_default: tuple | None = None
        self.dataset_named: tuple | None = None
        # the quad store a graph()-restricted view came from — a nested
        # GRAPH term must resolve against the ORIGINAL dataset, never the
        # already-restricted view (SPARQL active-graph override)
        self.parent_quads: "TripleStore | None" = None
        self._src_cache: dict = {}

    def with_dt_tracking(self) -> "TripleStore":
        """Shallow view of this store with datatype tracking on."""
        import copy

        out = copy.copy(self)
        out.track_dt = True
        return out

    def with_id_join_vars(self, id_vars: frozenset) -> "TripleStore":
        """Shallow view whose pattern compiler binds these vars as term ids."""
        import copy

        out = copy.copy(self)
        out.id_join_vars = frozenset(id_vars)
        return out

    def with_native_typed_vars(self, native: dict) -> "TripleStore":
        """Shallow view whose pattern compiler binds these vars natively."""
        import copy

        out = copy.copy(self)
        out.native_typed_vars = dict(native)
        return out

    def with_dataset(self, default: tuple = (), named: tuple = ()) -> "TripleStore":
        """Shallow view scoped by FROM/USING (default) and FROM NAMED/
        USING NAMED (named). SPARQL dataset semantics: once ANY dataset
        clause is present the dataset is FULLY specified — FROM without
        FROM NAMED means the named-graph set is EMPTY (GRAPH patterns
        yield zero solutions), and FROM NAMED without FROM means the
        default graph is empty. Both sides therefore become concrete
        (possibly-empty) tuples together; None = no dataset clause."""
        import copy

        out = copy.copy(self)
        if default or named:
            out.dataset_default = tuple(default)
            out.dataset_named = tuple(named)
        else:
            out.dataset_default = None
            out.dataset_named = None
        # the shallow copy would carry the UNRESTRICTED store's memoized
        # full-text surfaces into the dataset view — drop them so they
        # rebuild over the restricted dataset
        for memo in ("_ft_literal_texts", "_ft_literal_index",
                     "_ft_value_index", "_ft_subject_index"):
            out.__dict__.pop(memo, None)
        return out

    def with_named_sets(self, sets: dict) -> "TripleStore":
        """Shallow view carrying named solution sets (Blazegraph named
        subqueries: WITH {...} AS %set ... INCLUDE %set; ref:
        NamedSubqueryRoot.java / NamedSubqueryInclude.java)."""
        import copy

        out = copy.copy(self)
        out.named_sets = {**getattr(self, "named_sets", {}), **sets}
        return out

    @property
    def df(self) -> DataFrame:
        if self._df is None:
            self._df = self._df_factory()
        return self._df

    @df.setter
    def df(self, value: DataFrame) -> None:
        self._df = value

    def pattern_source(self, pred: str, typed: bool = False) -> DataFrame | None:
        """Virtual-index DataFrame for a constant predicate, if registered.

        ``typed=True`` asks for the object column in its NATIVE parquet type
        (no lexical string cast) — factories that predate the typed path
        ignore the flag and the compiler falls back to casting the lexical
        column, which is semantically identical."""
        if not self.pred_sources or pred not in self.pred_sources:
            return None
        key = (pred, typed)
        if key not in self._src_cache:
            factory = self.pred_sources[pred]
            use_typed = typed and _accepts_kwarg(factory, "typed")
            self._src_cache[key] = factory(typed=True) if use_typed else factory()
        return self._src_cache[key]

    @property
    def spark(self) -> SparkSession:
        if self._df is not None:
            return self._df.sparkSession
        # Don't force the lazy union view just to get a session handle.
        active = SparkSession.getActiveSession()
        return active if active is not None else self.df.sparkSession

    @property
    def has_graphs(self) -> bool:
        return "g" in self.df.columns

    def stats(self) -> dict[str, PredStat]:
        """Per-predicate (count, distinct-s, distinct-o) for join ordering.

        Computed once per store and cached; the predicate set is small (one
        per schema attribute) so the collected dict is tiny. At 100 TB these
        stats would be persisted next to the parquet at load time — see
        sources/parquet_store.py which does exactly that.
        """
        if self._stats is None:
            rows = (
                self.df.groupBy("p")
                .agg(
                    F.count(F.lit(1)).alias("c"),
                    F.approx_count_distinct("s").alias("ds"),
                    F.approx_count_distinct("o_lex").alias("do"),
                )
                .collect()
            )
            self._stats = {r["p"]: PredStat(r["c"], max(r["ds"], 1), max(r["do"], 1)) for r in rows}
            self._stats_exact = True
        return self._stats

    def stats_are_exact(self) -> bool:
        """True when per-predicate counts can answer COUNT(*)/ESTCARD
        exactly: either stats will be computed by the exact groupBy path on
        first use, or the injector (parquet-store persisted stats, complete
        parquet-footer null counts) marked them exact."""
        return self._stats is None or self._stats_exact

    def total(self) -> int:
        return sum(s.count for s in self.stats().values())

    def cache(self) -> "TripleStore":
        # localCheckpoint, not persist(): both pin the triples in memory
        # (MEMORY_AND_DISK, spills fine), but the checkpoint also TRUNCATES
        # the logical plan to a materialized leaf. With persist() the
        # analyzer/optimizer re-walks the full source parse subtree for
        # EVERY pattern of every query — a 13-pattern BSBM query re-analyzes
        # the ntriples regex-parse plan 13 times; the warm explore mix reads
        # 6.5-8.4 s persisted vs 5.0 s checkpointed, compile and execute
        # both dropping (r12; guide §3.3 "materialise to truncate plans").
        # Materialization is eager — cache() is a load-time/setup call.
        self.df = self.df.localCheckpoint(eager=True)
        return self

    def union(self, other: "TripleStore") -> "TripleStore":
        return TripleStore(self.df.unionByName(other.df, allowMissingColumns=True))

    def graph(self, g: str) -> "TripleStore":
        """Named-graph scoping (reference: DatasetNode / GRAPH keyword)."""
        if not self.has_graphs:
            raise ValueError("store has no graph column")
        out = TripleStore(self.df.filter(F.col("g") == g).drop("g"))
        out.track_dt = self.track_dt
        # id-join classification must survive graph scoping: a var bound as
        # an id inside GRAPH and as a string outside would never join
        out.id_join_vars = self.id_join_vars
        out.native_typed_vars = self.native_typed_vars
        out.parent_quads = self
        return out
