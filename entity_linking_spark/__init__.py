"""entity_linking_spark — a from-scratch PySpark-native record-linkage engine.

Re-expresses the query/data-processing semantics of the reference
entity-linking service (EduKgs/entity_linking, studied read-only at
/root/reference) as an idiomatic Spark batch pipeline:

    extract (HTML -> text, deterministic)        operators/extract.py
    -> blocking (host key + alias dict + MinHash-LSH)  operators/blocking.py
    -> pairwise scoring (string sims + embedding cosine) operators/scoring.py
    -> transitive clustering (large-star/small-star CC)  operators/cluster.py

plus the training-data-pipeline operators a 100 TB corpus needs
(dedup, ANN similarity search, text analysis, multimodal plumbing) and
their composition as a one-call curation job (curation.curate_corpus:
URL dedup -> C4 -> Gopher gates -> dedup -> decontamination -> PII).

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no RDDs,
no per-row Python UDFs in hot paths, no custom Catalyst rules.
"""

__version__ = "0.1.0"
