"""scoobie_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of the SCOOBIE
ontology-based information-extraction system (reference at
/root/reference, Java + Postgres) as a staged, declarative Spark
DataFrame job:

* KB ETL: RDF triple parse → cleanse → dictionary-encode into a star of
  ``resources`` / ``literals`` / ``relations`` / ``symbols`` tables
  (SURVEY.md §2 A1-A10).
* KB statistics: histograms, cardinalities, markov chain, type
  clusters, proper-noun ratings, regex distributions (A11-A16).
* Extraction pipeline: tokenize → prefix-hash gazetteer spotting →
  longest-match / case / token-tiling filters → instance resolution →
  connected-component disambiguation → known-fact retrieval →
  (subj, pred, obj) triple emission (B1-B25).
* Training-data extras: dedup (exact / minhash-LSH / simhash / n-gram
  jaccard / embedding), ANN similarity search, text quality analysis,
  multimodal column plumbing.

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no
row-at-a-time Python, no RDDs.
"""

__version__ = "0.1.0"
