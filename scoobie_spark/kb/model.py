"""Dictionary-encoded triple-store KB as four DataFrames.

Mirrors the reference's relational core (``connection/postgres/
dbscheme.sql:28-68``): two dictionaries (``resources`` uri↔id,
``literals`` literal↔id with a 4-char-prefix hash bucket) and two fact
tables (``relations`` s-p-o edges, ``symbols`` s-p-literal datatype
triples). At cluster scale these live as Iceberg/parquet tables —
``literals`` bucketed by ``prefix`` (the gazetteer join key, reference
``indexscheme.sql:1``), ``relations`` bucketed by ``s``; here they are
plain DataFrames with the same keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@dataclass
class KB:
    resources: DataFrame  # (id long, uri string)
    literals: DataFrame   # (id long, literal string, prefix int)
    relations: DataFrame  # (s long, p long, o long)
    symbols: DataFrame    # (s long, p long, lit long, belief double)
    _uri_ids: dict = field(default_factory=dict, repr=False)
    # memoized sc.broadcast handles for linking.kb_adjacency_broadcast,
    # keyed by (max_rows, max_bytes) — one ~64MB torrent per KB lifetime
    # instead of one per extract_triples call (streaming foreachBatch
    # used to re-ship it every micro-batch)
    _adj_bc: dict = field(default_factory=dict, repr=False)

    def uri_id(self, uri: str) -> int | None:
        """Dictionary point-lookup (reference PostgresKB.getUriIndex:352-368).

        Cached driver-side — these are O(1)-per-pipeline lookups of
        well-known URIs (rdf:type), not per-row calls.
        """
        return self.uri_ids([uri])[uri]

    def uri_ids(self, uris: list[str]) -> dict[str, "int | None"]:
        """Batched :meth:`uri_id`: resolve every uncached URI in ONE
        job (the pipeline used to pay one serial ~0.15 s ``first()``
        job per well-known URI per KB instance — profiled as the
        longest serial driver chain in the ×1 flagship)."""
        missing = [u for u in uris if u not in self._uri_ids]
        if missing:
            found = {
                r["uri"]: r["id"]
                for r in self.resources.filter(F.col("uri").isin(missing))
                .select("uri", "id")
                .collect()
            }
            for u in missing:
                self._uri_ids[u] = found.get(u)
        return {u: self._uri_ids[u] for u in uris}

    @property
    def rdf_type_id(self) -> int | None:
        return self.uri_id(RDF_TYPE)

    def gazetteer(self) -> DataFrame:
        """The spotting dictionary: one row per (lit_id, prop_id) with
        the MAX belief over subjects — reference
        ``PostgresKB.getDatatypePropertyValues`` (PostgresKB.java:160-208)
        without the per-document prefix filter; corpus-wide spotting
        applies the prefix semi-join on the document side instead
        (strictly less work than N per-doc queries).

        Aggregating belief (instead of DISTINCT over it) keeps the
        dictionary one-row-per-entry when different subjects assert the
        same (p, literal) with different beliefs — span-level belief is
        a spotting confidence; the per-SUBJECT belief rejoins from
        ``symbols`` at instance-resolution time."""
        return (
            self.symbols.join(self.literals.withColumnRenamed("id", "lit"), "lit")
            .groupBy(
                F.col("lit").alias("lit_id"),
                F.col("p").alias("prop_id"),
                "literal",
                "prefix",
            )
            .agg(F.max("belief").alias("belief"))
            .select("lit_id", "prop_id", "belief", "literal", "prefix")
        )

    def cache(self) -> "KB":
        for df in (self.resources, self.literals, self.relations, self.symbols):
            df.cache()
        return self

    def materialize(self) -> "KB":
        """Cut the ETL lineage. The four KB tables are re-read by nearly
        every pipeline stage (gazetteer join, instance resolution, graph
        expansion, URI decode); without a lineage cut each reuse re-embeds
        the whole dictionary-build plan and the logical tree grows
        combinatorially. On a cluster the durable form of this is the
        Iceberg/parquet write (:meth:`write`/:meth:`read`); in-session we
        use ``localCheckpoint`` (executor-local blocks)."""
        return KB(
            resources=self.resources.localCheckpoint(),
            literals=self.literals.localCheckpoint(),
            relations=self.relations.localCheckpoint(),
            symbols=self.symbols.localCheckpoint(),
            # ids are stable across the lineage cut — keep the resolved
            # well-known-URI cache instead of re-running the lookups
            _uri_ids=dict(self._uri_ids),
            # ... and the adjacency-broadcast memo (same edge content on
            # both sides of the cut): extract_triples' default
            # materialize_kb=True path produces a NEW KB object per
            # call, and dropping the memo here re-collected and
            # re-shipped the ~64MB blob on every repeated batch call.
            # Shared (not copied) so a build through either object
            # populates both.
            _adj_bc=self._adj_bc,
        )

    def write(self, base: str, fmt: str = "parquet") -> None:
        """A5 + A10: bulk-load sink (reference: CSV COPY + deferred
        b-tree indexes, PostgresKB.java:877-934). On a real cluster this
        is ``writeTo(...).partitionedBy(bucket(N, prefix))`` into
        Iceberg — the partition/sort layout IS the index; parquet is the
        sandbox stand-in (Iceberg jars not shipped)."""
        self.resources.write.mode("overwrite").format(fmt).save(f"{base}/resources")
        self.literals.repartition("prefix").write.mode("overwrite").format(fmt).save(
            f"{base}/literals"
        )
        self.relations.repartition("s").write.mode("overwrite").format(fmt).save(
            f"{base}/relations"
        )
        self.symbols.write.mode("overwrite").format(fmt).save(f"{base}/symbols")

    @classmethod
    def read(cls, spark, base: str, fmt: str = "parquet") -> "KB":
        return cls(
            resources=spark.read.format(fmt).load(f"{base}/resources"),
            literals=spark.read.format(fmt).load(f"{base}/literals"),
            relations=spark.read.format(fmt).load(f"{base}/relations"),
            symbols=spark.read.format(fmt).load(f"{base}/symbols"),
        )

    _BUCKET_KEYS = {
        "resources": "id",      # decode joins
        "literals": "prefix",   # gazetteer equi-join key (indexscheme.sql:1)
        "relations": "s",       # expansion-edge / known-facts joins
        "symbols": "lit",       # instance-resolution join (p, lit)
    }

    def write_bucketed(self, prefix: str = "scoobie_kb", buckets: int = 32) -> None:
        """A10 as a REAL bucketed layout: ``bucketBy`` + ``sortBy`` into
        catalog tables, one per KB table, each on its hot join key.
        A join probing a bucketed table on its bucket key skips that
        side's shuffle entirely (the write-time layout IS the index —
        the Spark analogue of the reference's deferred b-tree builds,
        PostgresKB.java:877-934, and of the Iceberg
        ``partitionedBy(bucket(N, key))`` layout this would use on a
        cluster)."""
        for name, key in self._BUCKET_KEYS.items():
            (
                getattr(self, name)
                .write.mode("overwrite")
                .bucketBy(buckets, key)
                .sortBy(key)
                .format("parquet")
                .saveAsTable(f"{prefix}_{name}")
            )

    @classmethod
    def read_bucketed(cls, spark, prefix: str = "scoobie_kb") -> "KB":
        return cls(
            resources=spark.table(f"{prefix}_resources"),
            literals=spark.table(f"{prefix}_literals"),
            relations=spark.table(f"{prefix}_relations"),
            symbols=spark.table(f"{prefix}_symbols"),
        )
