"""blazegraph_database_spark — a PySpark-native RDF/SPARQL analytics engine.

Re-implements the query + data-processing capabilities of the reference
Blazegraph triple/quad store (see SURVEY.md) Spark-first: triples are a
columnar DataFrame, SPARQL algebra compiles to Catalyst plans, and the GAS
graph-analytics API becomes an iterative DataFrame Pregel loop.
"""

from blazegraph_database_spark.model.store import TripleStore
from blazegraph_database_spark.model.terms import IRI, Lit, Var
from blazegraph_database_spark.session import get_spark

__all__ = ["TripleStore", "IRI", "Lit", "Var", "get_spark"]
__version__ = "0.1.0"
