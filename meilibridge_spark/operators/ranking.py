"""Configurable ranking rules (Meilisearch ``rankingRules`` setting).

The reference ships ``ranking_rules`` as a USER-SUPPLIED list
(``config/type.go:56`` in /root/reference; YAML surface
``config.example.yml:108-116``): Meilisearch lets you reorder or remove
the six built-in rules and insert custom ``field:asc`` / ``field:desc``
rules at any position. This module is the composition layer over the
criteria columns the search paths already compute
(``operators/search.py``): it parses a rule list into tokens and turns
them into an ordered sort key, with the query-time ``sort`` parameter
composed AT the position of the ``sort`` rule (Meilisearch semantics)
instead of as a post-hoc override.

Activation contract (documented deviation-free mapping onto this
engine's optional index tables): a listed built-in rule participates
only when its data exists —

- ``words``      — always (matched_terms is always computed);
- ``typo``       — when the caller supplied ``orig_terms`` (without a
  typo expansion every match is exact, so the criterion is constant and
  skipping it is rank-identical);
- ``proximity``  — when the index carries a positions table (byWord) or
  attrs blocks (byAttribute);
- ``attribute``  — when the index was built ``with_attributes=True``;
- ``sort``       — when the query carries ``sort`` parameters (exactly
  Meilisearch: the sort rule is a no-op for queries without ``sort``);
- ``exactness``  — when the caller supplied ``exact_terms`` (same
  constant-column argument as ``typo``).

Custom ``field:asc|desc`` rules always participate; the field's values
are joined from the docs table at ranking time (one doc_id equi-join,
AQE-sized). Documents without the field rank AFTER documents that have
it in either direction (nulls last — Meilisearch custom-rule
semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Meilisearch's default rule list (reference config/type.go:56 carries
#: it verbatim from the user's YAML; Meilisearch default shown in
#: config.example.yml:108-116).
DEFAULT_RANKING_RULES: "tuple[str, ...]" = (
    "words",
    "typo",
    "proximity",
    "attribute",
    "sort",
    "exactness",
)

_BUILTIN = frozenset(DEFAULT_RANKING_RULES)


def parse_ranking_rules(
    rules: "list[str] | tuple[str, ...]",
) -> "list[tuple]":
    """Validate + tokenize a rule list.

    Returns tokens in list order: ``("builtin", name)`` for the six
    built-in rules, ``("custom", field, ascending)`` for
    ``field:asc`` / ``field:desc``. Raises ``ValueError`` on an empty
    list, a duplicate built-in, a malformed custom rule, or an unknown
    name (Meilisearch's invalid_settings_ranking_rules analog).
    """
    if not rules:
        raise ValueError("ranking_rules must be a non-empty list")
    tokens: "list[tuple]" = []
    seen_builtin: set = set()
    for r in rules:
        if not isinstance(r, str) or not r.strip():
            raise ValueError(f"invalid ranking rule {r!r}")
        r = r.strip()
        if r in _BUILTIN:
            if r in seen_builtin:
                raise ValueError(f"duplicate ranking rule {r!r}")
            seen_builtin.add(r)
            tokens.append(("builtin", r))
            continue
        if ":" in r:
            fld, _, direction = r.rpartition(":")
            if direction not in ("asc", "desc") or not fld:
                raise ValueError(
                    f"custom ranking rule {r!r} must be 'field:asc' "
                    "or 'field:desc'"
                )
            if fld in _BUILTIN:
                raise ValueError(
                    f"custom ranking rule field {fld!r} collides with a "
                    "built-in rule name"
                )
            tokens.append(("custom", fld, direction == "asc"))
            continue
        raise ValueError(
            f"unknown ranking rule {r!r}: expected one of "
            f"{sorted(_BUILTIN)} or 'field:asc'/'field:desc'"
        )
    return tokens


def rules_doc_fields(
    tokens: "list[tuple]",
    sort_params: "list[tuple[str, bool]] | None",
) -> "list[str]":
    """Docs columns a tokenized rule list needs joined in: custom-rule
    fields plus (when the list has a ``sort`` slot and the query
    carries sort params) the sort fields, deduped in first-use order."""
    fields: "list[str]" = []
    for tok in tokens:
        if tok[0] == "custom" and tok[1] not in fields:
            fields.append(tok[1])
        elif tok[0] == "builtin" and tok[1] == "sort" and sort_params:
            for fld, _ in sort_params:
                if fld not in fields:
                    fields.append(fld)
    return fields


def compose_order(
    tokens: "list[tuple]",
    active: "dict[str, bool]",
    sort_params: "list[tuple[str, bool]] | None" = None,
) -> "list[Column]":
    """The ordered Column sort key for a tokenized rule list, ahead of
    the engine's final (score desc, doc_id asc) tie-break.

    ``active`` says which built-in criteria have data this query
    (see module docstring); inactive listed rules are skipped.
    Column-name contract (the criteria columns the search paths emit):
    words→matched_terms desc, typo→matched_exact desc,
    proximity→prox_cost asc, attribute→best_attr asc,
    exactness→exact_form desc; sort→the ``sort_params`` fields in
    order; custom→the field itself, nulls last both ways."""
    order: "list[Column]" = []
    for tok in tokens:
        if tok[0] == "custom":
            _, fld, asc = tok
            order.append(
                F.col(fld).asc_nulls_last()
                if asc
                else F.col(fld).desc_nulls_last()
            )
            continue
        name = tok[1]
        if not active.get(name):
            continue
        if name == "words":
            order.append(F.col("matched_terms").desc())
        elif name == "typo":
            order.append(F.col("matched_exact").desc())
        elif name == "proximity":
            order.append(F.col("prox_cost").asc())
        elif name == "attribute":
            order.append(F.col("best_attr").asc())
        elif name == "sort":
            for fld, asc in sort_params or ():
                order.append(
                    F.col(fld).asc_nulls_last()
                    if asc
                    else F.col(fld).desc_nulls_last()
                )
        elif name == "exactness":
            order.append(F.col("exact_form").desc())
    return order
