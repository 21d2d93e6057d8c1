"""Custom SPARQL function registry.

Reference: ``bigdata-core/bigdata-rdf/src/java/com/bigdata/rdf/sparql/ast/
FunctionRegistry.java`` — Blazegraph lets applications register value-
expression factories under a function IRI and call them from any SPARQL
expression position (``FILTER(<http://ex/fn>(?x) > 5)``); registration
refuses replacement (``add`` throws "Already declared."), aliases require
the target to exist (``addAlias``), and ``remove`` returns the factory.
``TestCustomFunction.java`` is the reference's test model.

Spark-first mapping: a factory is a plain Python callable taking
``pyspark.sql.Column`` (or python-literal) arguments and returning a
``Column`` — so a registered function compiles straight into the Catalyst
plan and stays inside whole-stage codegen (no Python UDF unless the
factory itself chooses one).

The reference pre-registers the XPath-functions namespace
(``http://www.w3.org/2005/xpath-functions#``) names for its SPARQL
built-ins (FunctionRegistry.java:113-230); we mirror the subset whose
built-ins exist here so e.g. ``fn:lower-case(?x)`` works verbatim.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from . import sparql_funcs as fn

XPATH_FUNCTIONS = "http://www.w3.org/2005/xpath-functions#"

_lock = threading.Lock()
_factories: dict[str, Callable] = {}


def register_function(iri: str, factory: Callable, *, replace: bool = False) -> None:
    """Register ``factory`` under ``iri``.

    Mirrors FunctionRegistry.add(): refuses to replace an existing
    registration unless ``replace=True`` (an escape hatch the reference
    reserves for test teardown via remove+add).
    """
    if not callable(factory):
        raise TypeError(f"function factory for <{iri}> must be callable")
    with _lock:
        if not replace and iri in _factories:
            raise ValueError(f"function <{iri}> already declared")
        _factories[iri] = factory


def register_alias(iri: str, alias: str) -> None:
    """Alias an already-declared function (FunctionRegistry.addAlias)."""
    with _lock:
        if iri not in _factories:
            raise ValueError(f"function <{iri}> not present")
        if alias in _factories:
            raise ValueError(f"alias <{alias}> already declared")
        _factories[alias] = _factories[iri]


def remove_function(iri: str) -> Optional[Callable]:
    """Remove and return the factory (FunctionRegistry.remove)."""
    with _lock:
        return _factories.pop(iri, None)


def contains_function(iri: str) -> bool:
    return iri in _factories


def resolve_function(iri: str) -> Optional[Callable]:
    return _factories.get(iri)


def _register_builtins() -> None:
    """Pre-register the XPath-namespace names the reference declares
    (FunctionRegistry.java:136-230) whose built-ins exist here."""
    for local, impl in {
        "matches": fn.REGEX,
        "lower-case": fn.LCASE,
        "upper-case": fn.UCASE,
        "string-length": fn.STRLEN,
        "concat": fn.CONCAT,
        "contains": fn.CONTAINS,
        "starts-with": fn.STRSTARTS,
        "ends-with": fn.STRENDS,
        "substring-before": fn.STRBEFORE,
        "substring-after": fn.STRAFTER,
        "encode-for-uri": fn.ENCODE_FOR_URI,
        "replace": fn.REPLACE,
        "numeric-abs": fn.ABS,
        "numeric-round": fn.ROUND,
        "numeric-ceil": fn.CEIL,
        "numeric-floor": fn.FLOOR,
        "year-from-dateTime": fn.YEAR,
        "month-from-dateTime": fn.MONTH,
        "day-from-dateTime": fn.DAY,
        "hours-from-dateTime": fn.HOURS,
        "minutes-from-dateTime": fn.MINUTES,
        "seconds-from-dateTime": fn.SECONDS,
        "timezone-from-dateTime": fn.TIMEZONE,
    }.items():
        _factories.setdefault(XPATH_FUNCTIONS + local, impl)


_register_builtins()
