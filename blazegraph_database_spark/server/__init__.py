from blazegraph_database_spark.server.rest import SparqlEndpoint, start_background

__all__ = ["SparqlEndpoint", "start_background"]
