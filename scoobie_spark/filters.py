"""SPARQL-template extraction filters — SURVEY.md §4 O1 / §1.1 FilterContext.

The reference compiles a user's SPARQL template into int-index filter
sets at document-creation time (``model/FilterContext.java:49-225``):
statement patterns inside the ``#recognized`` named graph contribute
datatype-property / object-property / subject / type filters, which are
then pushed into the gazetteer SQL (``predicate IN (...)``,
``RDFLiteralSpotting.java:61-69``).

Here the compiled filters become plain DataFrame ``isin`` predicates
applied to the gazetteer / candidates tables — Catalyst pushes them
through the joins into the scans (predicate pushdown is free once the
filter is declarative).

DELIBERATE divergence from the reference's visitor
(FilterContext.java ``lookupPredicate``): the reference classifies a
predicate via ``kb.getPropertyType`` and silently SKIPS unknown or
non-datatype predicates — a template naming only such predicates
leaves the datatype filter empty and spotting runs UNRESTRICTED. Here
the same template compiles to the impossible filter ``{-1}`` (spot
nothing): a constrained query should never over-extract the whole
corpus because its constraints could not be indexed, and the
``infer()`` mechanism (which the reference's own QueryExperiment
always pairs with object-property templates) is the supported way to
widen such a template. Pinned by
tests/test_filters_streaming_eval.py::test_template_pushdown_restricts_extraction
and ::test_template_infer_expands_filters. The parser handles the template subset the
reference's experiments use (PREFIX decls + triple patterns with
variables, URIs, and a ``GRAPH <...#recognized>`` block); it is a
~60-line regex parser, not a full SPARQL engine — rdflib is not in the
image and the reference only ever inspects statement patterns
(QueryExperiment.java:216-302).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kb.model import KB, RDF_TYPE

_PREFIX_RE = re.compile(r"PREFIX\s+(\w*):\s*<([^>]*)>", re.IGNORECASE)
_GRAPH_RE = re.compile(r"GRAPH\s+<([^>]*)>\s*\{(.*?)\}", re.IGNORECASE | re.DOTALL)
_TRIPLE_RE = re.compile(
    r"(\?\w+|<[^>]*>|\w*:\w+)\s+(\?\w+|a\b|<[^>]*>|\w*:\w+)\s+(\?\w+|<[^>]*>|\w*:\w+|\"[^\"]*\")"
)


@dataclass
class FilterContext:
    """Compiled extraction filters (int ids into the KB dictionaries)."""

    datatype_properties: set[int] = field(default_factory=set)
    object_properties: set[int] = field(default_factory=set)
    subjects: set[int] = field(default_factory=set)
    types: set[int] = field(default_factory=set)

    def filter_gazetteer(self, gazetteer: DataFrame) -> DataFrame:
        """Push the datatype-property filter into the gazetteer scan
        (the reference's `predicate IN (...)`, PostgresKB.java:177-186)."""
        if self.datatype_properties:
            return gazetteer.filter(
                F.col("prop_id").isin(*self.datatype_properties)
            )
        return gazetteer

    def filter_relations(self, relations: DataFrame) -> DataFrame:
        if self.object_properties:
            return relations.filter(F.col("p").isin(*self.object_properties))
        return relations

    def infer(
        self,
        markov_chain: DataFrame,
        type_clusters: DataFrame,
        proper_noun: DataFrame,
        markov_probability: float = 0.0,
        rating: float = 0.0,
    ) -> "FilterContext":
        """``FilterContext.infer`` parity (FilterContext.java:248-284):
        expand the compiled template filters through the KB statistics —

        1. each object property pulls the type clusters it connects from
           the markov chain (domain/range resolution,
           ``getConnectingClusters``: markov rows with probability >
           threshold, PostgresKB.java:777-804);
        2. each type is substituted by its cluster label, and every
           datatype property whose proper-noun rating for that cluster
           exceeds ``rating`` joins the datatype filter
           (``getDatatypePropertyByClass``, PostgresKB.java:745-772) —
           so a template naming only ``?s ex:livesIn ?o`` learns that
           e.g. ``rdfs:label`` literals spot its domain/range instances.

        All three stats tables are KB-statistics-scale (clusters ×
        properties), so the collects here are dictionary-side, not
        corpus-side. Mutates and returns self.
        """
        if self.object_properties:
            rows = (
                markov_chain.filter(
                    F.col("p").isin(*self.object_properties)
                    & (F.col("probability") > markov_probability)
                )
                .select("s_cluster", "o_cluster")
                .collect()
            )
            for r in rows:
                self.types.add(r["s_cluster"])
                self.types.add(r["o_cluster"])
        if self.types:
            cl = {r["type"]: r["cluster"] for r in type_clusters.collect()}
            labels = {cl.get(t, t) for t in self.types}
            # the downstream rdf:type filter compares against RAW type
            # ids, so a cluster label must expand back to every member
            # type — storing only the label (as the reference does)
            # would silently NARROW recall to subjects typed with the
            # representative member
            self.types = labels | {t for t, c in cl.items() if c in labels}
            props = (
                proper_noun.filter(
                    F.col("cluster").isin(*labels) & (F.col("rating") > rating)
                )
                .select("property")
                .distinct()
                .collect()
            )
            inferred = {r["property"] for r in props}
            if inferred:
                self.datatype_properties = (
                    self.datatype_properties - {-1}
                ) | inferred
        return self


def _expand(term: str, prefixes: dict[str, str]) -> str | None:
    term = term.strip()
    if term.startswith("<") and term.endswith(">"):
        return term[1:-1]
    if term == "a":
        return RDF_TYPE
    m = re.match(r"^(\w*):(\w+)$", term)
    if m and m.group(1) in prefixes:
        return prefixes[m.group(1)] + m.group(2)
    return None  # variable or literal


def compile_template(query: str, kb: KB) -> FilterContext:
    """Parse a SPARQL template → FilterContext with dictionary-encoded
    filter ids. Patterns outside a #recognized GRAPH block are ignored,
    like the reference's visitor (FilterContext.java:76-187)."""
    prefixes = dict(_PREFIX_RE.findall(query))
    ctx = FilterContext()

    blocks = [
        body for g, body in _GRAPH_RE.findall(query) if g.endswith("#recognized")
    ]
    datatype_uris: set[str] = set()
    object_uris: set[str] = set()
    subject_uris: set[str] = set()
    type_uris: set[str] = set()

    for body in blocks:
        for s_t, p_t, o_t in _TRIPLE_RE.findall(body):
            s_u = _expand(s_t, prefixes)
            p_u = _expand(p_t, prefixes)
            o_u = _expand(o_t, prefixes)
            if s_u:
                subject_uris.add(s_u)
            if p_u == RDF_TYPE:
                if o_u:
                    type_uris.add(o_u)
            elif p_u:
                # object position is a literal or a literal-var → datatype
                # property; a URI/resource-var → object property. The
                # reference distinguishes via the KB's symbols/relations
                # membership; we use the same test.
                if o_t.startswith('"'):
                    datatype_uris.add(p_u)
                elif o_u:
                    object_uris.add(p_u)
                else:
                    # variable object: consult the KB — a predicate seen in
                    # symbols is a datatype property, in relations an
                    # object property (both possible)
                    datatype_uris.add(p_u)
                    object_uris.add(p_u)

    # ONE batched dictionary lookup for every template URI (kb.uri_ids
    # caches and batches; four separate isin-collects here were four
    # serial driver jobs)
    all_uris = subject_uris | type_uris | datatype_uris | object_uris
    uri_map = kb.uri_ids(sorted(all_uris)) if all_uris else {}

    def ids_of(uris: set[str]) -> set[int]:
        return {uri_map[u] for u in uris if uri_map.get(u) is not None}

    # a template URI missing from the dictionary compiles to the
    # impossible id -1 (the reference's getUriIndex returns -1 for
    # unknown URIs, so its IN-filter matches nothing either)
    def ids_or_impossible(uris: set[str]) -> set[int]:
        return ids_of(uris) or ({-1} if uris else set())

    ctx.subjects = ids_or_impossible(subject_uris)
    ctx.types = ids_or_impossible(type_uris)
    dt_ids = ids_or_impossible(datatype_uris)
    op_ids = ids_or_impossible(object_uris)
    if dt_ids:
        sym_preds = {
            r["p"]
            for r in kb.symbols.filter(F.col("p").isin(*dt_ids)).select("p").distinct().collect()
        }
        ctx.datatype_properties = sym_preds or {-1}
    if op_ids:
        rel_preds = {
            r["p"]
            for r in kb.relations.filter(F.col("p").isin(*op_ids)).select("p").distinct().collect()
        }
        ctx.object_properties = rel_preds or {-1}
    return ctx
