"""inverted_index_and_search_spark — a PySpark-native full-text engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo ``Tenshin000/Inverted-Index-And-Search`` (a four-way
Hadoop/Spark-DF/Spark-RDD/SPIMI inverted-index builder + boolean-AND
search REPL), re-expressed Spark-first:

- corpus       -> deterministic synthetic source-code corpus
                  (repo, path, commit, lang, content)
- tokenizer    -> canonical tokenizer (ref semantics: lowercase, keep
                  letters+digits, strip underscore; see SURVEY.md §2.8)
- operators.index_build -> postings + doc/term/collection statistics
- operators.query       -> boolean AND/OR/NOT (AND = reference parity)
                           + BM25 top-k + per-doc TF-IDF keywords
- operators.positional  -> positional index (token offsets), exact
                           phrase + proximity queries, hot-term
                           posting-list sharding
- operators.search_expr -> boolean query language (AND/OR/NOT, parens,
                           quoted phrases) + ranked expression search
- operators.segments    -> delta+varint compressed posting segments with
                           block-max metadata; positional variant adds
                           positions_enc for phrase eval over the
                           compressed layout (driver/batch/warm-server)
- kernels      -> numpy/Arrow kernels (codec, BM25, block-max WAND)
- operators.dedup / similarity / text_analysis -> training-data pipeline
  operators (exact + MinHash-LSH + SimHash dedup, ANN search, lang-id,
  quality scoring, fingerprinting)
- checkpoint   -> per-bucket commit manifest for resumable builds

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behaviour.
"""

__version__ = "0.1.0"

from inverted_index_and_search_spark.session import get_spark  # noqa: F401
