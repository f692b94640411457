"""Tag-predicate filter grammar -> Catalyst Column expression.

Same grammar as the reference's ``filter_relation``/``filter_way``
(mod.rs:88-144): ``&``-separated conjunction of terms; a term is either
``key`` (tag-existence) or ``key=v1,v2`` (tag value IN list). A missing
key always rejects the row. Compiled to pure Catalyst expressions
(map getItem / isin) so predicate pushdown and whole-stage codegen
apply — no Python in the filter path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Public-transport-v2 preset. The reference's literal preset
#: (mod.rs:151) also demands a ``route_master`` tag, but its own
#: integration fixture relations have no such tag (verified by decode:
#: tests/fixtures/testpbf_entities.json), so the literal preset would
#: select nothing from its own test file. We define the ptv2 preset the
#: way the reference's test expectations require (name + route IN ...)
#: and keep the literal string available as PTV2_FILTER_STRICT.
PTV2_FILTER = "name&route=bus,tram,train,subway,light_rail,monorail,trolleybus"
PTV2_FILTER_STRICT = (
    "name&route_master&route=bus,tram,train,subway,light_rail,monorail,trolleybus"
)
#: Administrative-areas preset (mod.rs:157-163).
AA_FILTER = "name&admin_level&boundary=administrative"


def compile_tag_filter(conditions: str, tags_col: str = "tags") -> Column:
    """Compile a filter string into a boolean Column over a MAP column.

    >>> df.filter(compile_tag_filter("name&route=bus,tram"))
    """
    terms = []
    for term in conditions.split("&"):
        key, eq, values = term.partition("=")
        tag = F.col(tags_col).getItem(key)
        cond = tag.isNotNull()
        if eq:
            cond = cond & tag.isin(*values.split(","))
        terms.append(cond)
    return reduce(lambda a, b: a & b, terms)


def tag_filter_py(tags: dict, conditions: str) -> bool:
    """Driver/UDF-free reference implementation of the same grammar for
    tests and oracle computation (identical semantics to the Column)."""
    for term in conditions.split("&"):
        key, eq, values = term.partition("=")
        if tags is None or key not in tags:
            return False
        if eq and tags[key] not in values.split(","):
            return False
    return True
