"""RDF term model.

The reference encodes terms as a hierarchy of "internal values" (IVs) with
inline representations for numerics/dates and a dictionary for the rest
(reference: bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/internal/IV.java).
Spark-first we keep terms as two columns: ``o_lex`` (lexical form, string) and
``o_dt`` (datatype tag) — typed comparison casts at the use site and stays
inside whole-stage codegen; the dictionary encoding lives in
:mod:`blazegraph_database_spark.model.dictionary`.

Datatype tags: ``iri``, ``bnode``, ``string``, ``long``, ``double``,
``decimal``, ``boolean``, ``timestamp`` (``long`` covers the xsd:integer
family, ``double`` covers xsd:double/float, ``decimal`` is FIRST-CLASS so
exact BigDecimal-scale arithmetic — ref: XSDDecimalIV.java — keys off it;
language-tagged literals carry ``lang:<tag>``).
"""

from __future__ import annotations

from dataclasses import dataclass

DT_IRI = "iri"
DT_BNODE = "bnode"
DT_STRING = "string"
DT_LONG = "long"
DT_DOUBLE = "double"
DT_DECIMAL = "decimal"
DT_BOOLEAN = "boolean"
DT_TIMESTAMP = "timestamp"


@dataclass(frozen=True)
class Var:
    """A SPARQL variable; compiles to a DataFrame column of the same name."""

    name: str


@dataclass(frozen=True)
class IRI:
    value: str


@dataclass(frozen=True)
class Lit:
    lex: str
    dt: str = DT_STRING

    @classmethod
    def long(cls, v: int) -> "Lit":
        return cls(str(int(v)), DT_LONG)

    @classmethod
    def double(cls, v: float) -> "Lit":
        return cls(repr(float(v)), DT_DOUBLE)


Term = IRI | Lit


def is_const(x) -> bool:
    return isinstance(x, (IRI, Lit, str))


def const_lex(x) -> str:
    """Lexical form of a constant pattern position (str means IRI)."""
    if isinstance(x, str):
        return x
    if isinstance(x, IRI):
        return x.value
    if isinstance(x, Lit):
        return x.lex
    raise TypeError(f"not a constant term: {x!r}")
