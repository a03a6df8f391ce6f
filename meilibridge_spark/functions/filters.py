"""Meilisearch filter-expression parser -> Catalyst Column (Q7).

The reference ships ``filterable_attributes`` to Meilisearch
(config/type.go:62), whose public filter grammar a search client then
uses. This module implements that grammar natively so a filter STRING a
Meilisearch user writes today works against our docs table:

  condition:   field = value | field != value | field > value
               | field >= value | field < value | field <= value
               | field low TO high            (inclusive range)
               | field IN [v1, v2, ...] | field NOT IN [v1, v2, ...]
               | field EXISTS | field NOT EXISTS
               | field IS NULL | field IS NOT NULL
               | field IS EMPTY | field IS NOT EMPTY
               | field CONTAINS value | field NOT CONTAINS value
               | field STARTS WITH value | field NOT STARTS WITH value
  combinators: NOT expr, expr AND expr, expr OR expr, ( expr )
  values:      'single' / "double" quoted strings, bare words, numbers

Geosearch (functions/geo.py): ``_geoRadius(lat, lng, meters)`` and
``_geoBoundingBox([lat, lng], [lat, lng])`` compile when the index
declares ``geo_attributes=(lat_col, lng_col)`` — Meilisearch's analog
of ``_geo`` in filterableAttributes. Without the declaration they
raise loudly (never silently mis-filter), and ``_geoPoint`` in a
filter raises Meilisearch's "is a sort rule" error.

Fields must be declared filterable — a filter on any other attribute
raises ConfigError, mirroring Meilisearch's invalid_search_filter
error. The output is a pure Catalyst Column, so filters push down /
prune exactly like hand-written ``F.col`` predicates.

NULL semantics are Meilisearch's SET-COMPLEMENT model, not SQL
three-valued logic: every condition is two-valued (a comparison on a
missing/NULL attribute selects nothing), ``!=`` and ``NOT`` take the
complement of the selected set — so ``tool != 'code'`` and
``NOT tool = 'code'`` both INCLUDE documents whose ``tool`` is
missing, exactly as a Meilisearch filter does. Use ``EXISTS`` /
``IS NULL`` for explicit presence tests.

Implementation note for pushdown: negation is applied at PARSE time
(De Morgan through AND/OR, complemented leaves like
``(col != v) OR col IS NULL``) rather than wrapping Columns in
``coalesce``/``NOT`` — a coalesce-wrapped predicate cannot reach the
parquet scan, while these stay in PushedFilters (plan-tested).

Case folding: Meilisearch compares filter strings case-insensitively;
the default here is case-SENSITIVE because a ``lower(col)`` wrapper
cannot reach the parquet scan (PushedFilters dies — measured). Pass
``fold_case=True`` (or set ``IndexConfig.filter_fold_case``) for
Meilisearch-faithful folded equality/IN/CONTAINS/STARTS WITH on string
values, trading scan pushdown for fidelity on exactly the folded
leaves; numeric comparisons are unaffected.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from meilibridge_spark.config import ConfigError

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>\[) | (?P<rbrack>\]) | (?P<comma>,) |
        (?P<op>!=|>=|<=|=|>|<) |
        (?P<squote>'(?:[^'\\]|\\.)*') |
        (?P<dquote>"(?:[^"\\]|\\.)*") |
        (?P<word>[^\s()\[\],!=<>'"]+)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "TO", "IN", "EXISTS", "IS", "NULL",
    "EMPTY", "CONTAINS", "STARTS", "WITH",
}


def _or_null(field: str, cond: Column) -> Column:
    return cond | F.col(field).isNull()


def _tokenize(expr: str) -> "list[tuple[str, str]]":
    out: "list[tuple[str, str]]" = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN_RX.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip():
                raise ConfigError(f"bad filter syntax at: {expr[pos:]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind in ("squote", "dquote"):
            body = text[1:-1]
            body = re.sub(r"\\(.)", r"\1", body)
            out.append(("str", body))
        elif kind == "word":
            if text.upper() in _KEYWORDS:
                out.append(("kw", text.upper()))
            else:
                out.append(("word", text))
        else:
            out.append((kind, text))
    return out


def _literal(tok: "tuple[str, str]"):
    kind, text = tok
    if kind == "str":
        return text
    if kind == "word":
        try:
            return int(text)
        except ValueError:
            pass
        try:
            return float(text)
        except ValueError:
            pass
        return text
    raise ConfigError(f"expected a value, got {text!r}")


class _Parser:
    def __init__(
        self,
        tokens,
        filterable: "tuple[str, ...]",
        fold_case=False,
        geo: "tuple[str, str] | None" = None,
        features=None,
    ):
        self.toks = tokens
        self.i = 0
        self.filterable = set(filterable)
        self.fold_case = fold_case
        self.geo = geo
        #: optional attr -> feature-dict resolver (IndexConfig.
        #: filter_features) for v1.12 granular filterableAttributes:
        #: when set it decides BOTH membership and which operator
        #: families the attribute supports (None return = not
        #: filterable; {"equality": bool, "comparison": bool, ...}
        #: gates =/!=/IN/EXISTS/IS/CONTAINS/STARTS WITH vs
        #: >/>=/</<=/TO, Meilisearch's feature split)
        self.features = features

    def _require_feature(self, field: str, family: str) -> None:
        """Meilisearch invalid_search_filter analog for the v1.12
        per-attribute filter feature flags (no-op for legacy
        declarations, which grant every family)."""
        if self.features is None:
            return
        feats = self.features(field)
        if feats is not None and not feats.get(family, True):
            raise ConfigError(
                f"attribute {field!r} does not support {family} filter "
                f"operators: its filterableAttributes rule sets "
                f"filter.{family}=false"
            )

    def _fold(self, c: Column, val):
        """(column, literal) for an equality-family comparison —
        lower()-folded when fold_case and the value is a string."""
        if self.fold_case and isinstance(val, str):
            return F.lower(c), F.lit(val.lower())
        return c, F.lit(val)

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def _expect(self, kind, text=None):
        k, t = self._next()
        if k != kind or (text is not None and t != text):
            raise ConfigError(f"expected {text or kind}, got {t!r}")
        return t

    def parse(self) -> Column:
        col = self._or(False)
        if self.i != len(self.toks):
            raise ConfigError(
                f"trailing filter tokens: {self.toks[self.i:]!r}"
            )
        return col

    # ``neg`` threads set-complement negation down to the leaves
    # (De Morgan): NOT (a OR b) = NOT a AND NOT b, etc.

    def _or(self, neg: bool) -> Column:
        left = self._and(neg)
        while self._peek() == ("kw", "OR"):
            self._next()
            right = self._and(neg)
            left = (left & right) if neg else (left | right)
        return left

    def _and(self, neg: bool) -> Column:
        left = self._not(neg)
        while self._peek() == ("kw", "AND"):
            self._next()
            right = self._not(neg)
            left = (left | right) if neg else (left & right)
        return left

    def _not(self, neg: bool) -> Column:
        if self._peek() == ("kw", "NOT"):
            # lookahead: 'field NOT EXISTS' is handled in _condition;
            # here NOT is a prefix only before '(' or another condition
            self._next()
            return self._not(not neg)
        return self._primary(neg)

    def _primary(self, neg: bool) -> Column:
        if self._peek()[0] == "lparen":
            self._next()
            col = self._or(neg)
            self._expect("rparen")
            return col
        if self._peek()[0] == "word" and self._peek()[1] in (
            "_geoRadius",
            "_geoBoundingBox",
        ):
            return self._geo_fn(neg)
        return self._condition(neg)

    def _geo_num(self, where: str) -> float:
        val = _literal(self._next())
        if not isinstance(val, (int, float)) or isinstance(val, bool):
            raise ConfigError(f"{where}: expected a number, got {val!r}")
        return float(val)

    def _geo_pair(self, where: str) -> "tuple[float, float]":
        self._expect("lbrack")
        lat = self._geo_num(where)
        self._expect("comma")
        lng = self._geo_num(where)
        self._expect("rbrack")
        return lat, lng

    def _geo_fn(self, neg: bool) -> Column:
        """_geoRadius(lat, lng, meters) / _geoBoundingBox([lat, lng],
        [lat, lng]) — Meilisearch geosearch filter functions, compiled
        against the index's declared (lat_col, lng_col) columns
        (functions/geo.py; sargable window + exact haversine)."""
        from meilibridge_spark.functions import geo as _geo

        _, fn = self._next()
        if self.geo is None:
            raise ConfigError(
                f"{fn} needs geo_attributes=(lat_col, lng_col) declared "
                "on the index (the analog of adding _geo to "
                "filterableAttributes)"
            )
        lat_col, lng_col = F.col(self.geo[0]), F.col(self.geo[1])
        self._expect("lparen")
        if fn == "_geoRadius":
            lat = self._geo_num(fn)
            self._expect("comma")
            lng = self._geo_num(fn)
            self._expect("comma")
            meters = self._geo_num(fn)
            self._expect("rparen")
            make = _geo.geo_radius_complement if neg else _geo.geo_radius
            return make(lat_col, lng_col, lat, lng, meters)
        tl = self._geo_pair(fn)
        self._expect("comma")
        br = self._geo_pair(fn)
        self._expect("rparen")
        make = (
            _geo.geo_bounding_box_complement if neg else _geo.geo_bounding_box
        )
        return make(lat_col, lng_col, tl, br)

    def _field(self) -> str:
        kind, text = self._next()
        if kind not in ("word", "str"):
            raise ConfigError(f"expected an attribute name, got {text!r}")
        if text.startswith("_geoPoint"):
            # Meilisearch's invalid_search_filter wording
            raise ConfigError(
                "_geoPoint is a sort rule, not a filter: use "
                "_geoRadius / _geoBoundingBox to filter by location"
            )
        if text.startswith("_geo"):
            raise ConfigError(
                f"{text!r} is not a filterable expression: the geo "
                "filter functions are _geoRadius(lat, lng, meters) and "
                "_geoBoundingBox([lat, lng], [lat, lng])"
            )
        if self.features is not None:
            if self.features(text) is None:
                raise ConfigError(
                    f"attribute {text!r} is not filterable; declare it "
                    "in filterable_attributes or match it with a "
                    "filterable_attribute_rules pattern"
                )
        elif text not in self.filterable:
            raise ConfigError(
                f"attribute {text!r} is not filterable; declare it in "
                f"filterable_attributes (have: {sorted(self.filterable)})"
            )
        return text

    def _condition(self, neg: bool) -> Column:
        field = self._field()
        kind, text = self._peek()
        c = F.col(field)
        if kind == "kw" and text in (
            "IN", "CONTAINS", "STARTS", "EXISTS", "NOT", "IS",
        ):
            # Meilisearch v1.12 feature split: these all belong to the
            # 'equality' family; ranges and ordered comparisons below
            # are the 'comparison' family
            self._require_feature(field, "equality")
        elif kind == "op":
            self._require_feature(
                field, "equality" if text in ("=", "!=") else "comparison"
            )
        elif kind in ("word", "str"):
            # bare value ahead = the 'low TO high' range form
            self._require_feature(field, "comparison")
        if kind == "op":
            self._next()
            raw = _literal(self._next())
            fc, val = self._fold(c, raw)
            # positive leaves need no NULL handling (SQL drops NULL
            # results = two-valued False); complements OR in IS NULL
            pos = {
                "=": fc == val, "!=": fc != val,
                ">": c > F.lit(raw), ">=": c >= F.lit(raw),
                "<": c < F.lit(raw), "<=": c <= F.lit(raw),
            }
            comp = {
                "=": _or_null(field, fc != val),
                "!=": fc == val,
                ">": _or_null(field, c <= F.lit(raw)),
                ">=": _or_null(field, c < F.lit(raw)),
                "<": _or_null(field, c >= F.lit(raw)),
                "<=": _or_null(field, c > F.lit(raw)),
            }
            if text == "!=" and not neg:
                # != itself is a complement (includes missing values)
                return _or_null(field, fc != val)
            return comp[text] if neg else pos[text]
        if (kind, text) == ("kw", "IN"):
            return self._in_list(field, c, neg)
        if (kind, text) == ("kw", "CONTAINS"):
            self._next()
            fc, val = self._fold(c, str(_literal(self._next())))
            if neg:
                return _or_null(field, ~fc.contains(val))
            return fc.contains(val)
        if (kind, text) == ("kw", "STARTS"):
            self._next()
            self._expect("kw", "WITH")
            fc, val = self._fold(c, str(_literal(self._next())))
            if neg:
                return _or_null(field, ~fc.startswith(val))
            return fc.startswith(val)
        if (kind, text) == ("kw", "EXISTS"):
            self._next()
            return c.isNull() if neg else c.isNotNull()
        if (kind, text) == ("kw", "NOT"):
            self._next()
            k2, t2 = self._peek()
            if (k2, t2) == ("kw", "EXISTS"):
                self._next()
                return c.isNotNull() if neg else c.isNull()
            if (k2, t2) == ("kw", "IN"):
                return self._in_list(field, c, not neg)
            if (k2, t2) == ("kw", "CONTAINS"):
                self._next()
                fc, val = self._fold(c, str(_literal(self._next())))
                if neg:  # double negation
                    return fc.contains(val)
                return _or_null(field, ~fc.contains(val))
            if (k2, t2) == ("kw", "STARTS"):
                self._next()
                self._expect("kw", "WITH")
                fc, val = self._fold(c, str(_literal(self._next())))
                if neg:
                    return fc.startswith(val)
                return _or_null(field, ~fc.startswith(val))
            raise ConfigError(
                f"expected EXISTS/IN/CONTAINS/STARTS WITH after "
                f"'{field} NOT', got {t2!r}"
            )
        if (kind, text) == ("kw", "IS"):
            self._next()
            k2, t2 = self._next()
            if (k2, t2) == ("kw", "NULL"):
                return c.isNotNull() if neg else c.isNull()
            if (k2, t2) == ("kw", "EMPTY"):
                # empty-string value; complement includes missing docs
                return _or_null(field, c != "") if neg else (c == "")
            if (k2, t2) == ("kw", "NOT"):
                k3, t3 = self._next()
                if (k3, t3) == ("kw", "NULL"):
                    return c.isNull() if neg else c.isNotNull()
                if (k3, t3) == ("kw", "EMPTY"):
                    return (c == "") if neg else _or_null(field, c != "")
                raise ConfigError(
                    f"expected NULL/EMPTY after IS NOT, got {t3!r}"
                )
            raise ConfigError(
                f"expected NULL/EMPTY/NOT after IS, got {t2!r}"
            )
        # range: field low TO high (inclusive, Meilisearch TO)
        low = F.lit(_literal(self._next()))
        self._expect("kw", "TO")
        high = F.lit(_literal(self._next()))
        if neg:
            return _or_null(field, (c < low) | (c > high))
        return c.between(low, high)

    def _in_list(self, field: str, c: Column, neg: bool) -> Column:
        """IN [...] — ``neg`` True is the NOT IN / negated complement
        (includes docs missing the attribute, set-complement rule)."""
        self._expect("kw", "IN")
        self._expect("lbrack")
        vals = []
        while self._peek()[0] != "rbrack":
            vals.append(_literal(self._next()))
            if self._peek()[0] == "comma":
                self._next()
        self._expect("rbrack")
        if not vals:
            raise ConfigError(f"empty IN list for {field!r}")
        if self.fold_case and any(isinstance(v, str) for v in vals):
            # fold ONLY the string members: F.lower(c) casts the column
            # to string, so comparing unmodified numeric members against
            # it would silently never match — split into two ORed
            # predicates (folded strings vs untouched non-strings)
            svals = [v.lower() for v in vals if isinstance(v, str)]
            ovals = [v for v in vals if not isinstance(v, str)]
            pred = F.lower(c).isin(svals)
            if ovals:
                pred = pred | c.isin(ovals)
        else:
            pred = c.isin(vals)
        if neg:
            return _or_null(field, ~pred)
        return pred


def parse_filter(
    expr: str,
    filterable: "tuple[str, ...]",
    fold_case: bool = False,
    geo: "tuple[str, str] | None" = None,
    features=None,
) -> Column:
    """Compile a Meilisearch filter string to a Catalyst Column,
    enforcing ``filterable_attributes`` membership. ``fold_case``:
    Meilisearch-style case-insensitive string comparison (see module
    docstring for the pushdown trade). ``geo``: the (lat_col, lng_col)
    columns backing the ``_geo`` field — enables _geoRadius /
    _geoBoundingBox (functions/geo.py). ``features``: optional
    attr -> feature-dict resolver (``IndexConfig.filter_features``)
    implementing the v1.12 granular filterableAttributes — it then
    decides membership (None = not filterable) and gates operator
    families per attribute (equality vs comparison)."""
    tokens = _tokenize(expr)
    if not tokens:
        raise ConfigError("empty filter expression")
    return _Parser(
        tokens, filterable, fold_case=fold_case, geo=geo, features=features
    ).parse()


def filter_doc_ids(index, expr: str, fold_case: "bool | None" = None):
    """Apply a filter expression against the index's docs table ->
    doc_id DataFrame, ready for ``search(..., filter_docs=...)`` /
    ``search_many(..., filter_docs=...)``. ``fold_case`` defaults to
    the index's ``cfg.filter_fold_case``; geo filter functions compile
    when the index declares ``cfg.geo_attributes``."""
    if fold_case is None:
        fold_case = getattr(index.cfg, "filter_fold_case", False)
    features = (
        index.cfg.filter_features
        if getattr(index.cfg, "filterable_attribute_rules", ())
        else None
    )
    col = parse_filter(
        expr,
        tuple(index.cfg.filterable_attributes),
        fold_case=fold_case,
        geo=getattr(index.cfg, "geo_attributes", None),
        features=features,
    )
    return index.docs.filter(col).select("doc_id")
