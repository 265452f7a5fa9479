"""ner_funtool_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the query / data-processing capabilities of
WenRichard/NER-FunTool (reference at /root/reference, see SURVEY.md) on top of
``ray.data.Dataset`` streaming execution:

- sequence tagging (numpy BiLSTM+CRF with Viterbi decode; cascade BMEO+attr
  heads) as stateful actor-pool ``map_batches`` stages,
- BMES/BIO span decoding into mentions,
- entity linking (char-ngram MinHash blocking), canonicalization
  (groupby on normalized surface keys), triple materialization with
  dedup + subject-hash partitioning,
- tag-level / entity-level / CLUE-style P/R/F1 metric aggregates,
- large-scale training-data ops: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), similarity search, text analysis, multimodal plumbing.

Nothing here calls ``ray.init``; the caller owns the Ray session.
"""

__version__ = "0.1.0"
