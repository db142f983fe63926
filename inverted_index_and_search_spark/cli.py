"""Search REPL + build CLI — the reference's user surface, Spark-native.

Reference parity: ``search-query.py:92-131`` (interactive ``> `` loop,
boolean AND over a built index, ``"No matches found."`` on empty);
``spark/inverted_index_search.py:463-545`` (build entry with
``--limit-mb`` / ``--format`` / output path).

Usage (spark-submit or plain python):

  python -m inverted_index_and_search_spark.cli build \
      --input /root/testdata/sf0.01/documents.parquet \
      --content-col text --output /tmp/idx [--limit-mb 8] \
      [--format parquet|text|json]
  python -m inverted_index_and_search_spark.cli search --index /tmp/idx \
      [--bm25 --topk 10] [--query "def return"]   # omit --query for REPL
"""

from __future__ import annotations

import argparse
import sys

from inverted_index_and_search_spark.operators import index_build as ib
from inverted_index_and_search_spark.operators import query as q
from inverted_index_and_search_spark.session import get_spark


def _session(app_name: str):
    """(session, created): reuse an active session (e.g. under pytest or
    an interactive shell) and only own/stop one we created ourselves."""
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        return existing, False
    return get_spark(app_name=app_name), True


def _looks_like_parquet(path: str) -> bool:
    """Input auto-detection: a parquet file/dataset vs a directory of
    raw text files (the reference's primary input shape)."""
    import os

    if path.endswith(".parquet") or not os.path.isdir(path):
        return True
    for root, _dirs, fs in os.walk(path):
        for f in fs:
            if f.endswith(".parquet"):
                return True
            if f.endswith(".txt"):
                return False
    return True


def _build(args: argparse.Namespace) -> None:
    spark, created = _session("iis-build")
    in_fmt = args.input_format
    if in_fmt == "auto":
        in_fmt = ("parquet" if all(_looks_like_parquet(p) for p in args.input)
                  else "text-dir")
    if in_fmt == "text-dir":
        # reference entry path: directory tree(s) of plaintext files,
        # basename = docID (safe_read, spark/inverted_index_search.py:72-100;
        # multiple paths union like --input-folder/--input-texts)
        from inverted_index_and_search_spark.sources.files import docs_from_files
        docs = docs_from_files(spark, args.input, glob=args.glob)
        args.content_col, args.id_col = "content", "doc_id"
    else:
        # catalog adapter: Iceberg table names on a real cluster,
        # parquet paths in the sandbox — unioned across inputs
        from functools import reduce

        from inverted_index_and_search_spark.sources.catalog import load_documents
        dfs = [load_documents(spark, p) for p in args.input]
        docs = reduce(lambda a, b: a.unionByName(b), dfs)
    if args.id_col not in docs.columns:
        from inverted_index_and_search_spark.corpus import with_doc_id
        docs = with_doc_id(docs)
    if args.limit_mb is not None:
        docs = ib.budget_input(docs, args.limit_mb,
                               content_col=args.content_col,
                               id_col=args.id_col)
    import time

    analyzer = None
    if args.stopwords or args.stem:
        from inverted_index_and_search_spark.analysis import Analyzer

        stop = []
        if args.stopwords:
            with open(args.stopwords, encoding="utf-8") as f:
                stop = [ln.strip() for ln in f
                        if ln.strip() and not ln.startswith("#")]
        analyzer = Analyzer.make(stop, args.stem)

    if (args.forward or args.inline_dl) and (
            args.format != "parquet" or args.field
            or (args.inline_dl and args.positional)):
        print("error: --forward/--inline-dl need the parquet format "
              "(non-fielded; --inline-dl also excludes --positional)",
              file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)

    t0 = time.perf_counter()
    if args.field:
        from inverted_index_and_search_spark.operators.fielded import (
            build_fielded_index,
        )

        if args.format != "parquet" or args.positional:
            print("error: --field builds are parquet-layout only "
                  "(weighted tf is fractional — the text/json/segment "
                  "wire formats carry integer tf)", file=sys.stderr)
            if created:
                spark.stop()
            raise SystemExit(2)
        fields: dict[str, float] = {}
        for spec in args.field:
            col, sep, w = spec.rpartition(":")
            try:
                if not sep:
                    raise ValueError
                fields[col] = float(w)
            except ValueError:
                print(f"error: bad --field {spec!r} (want COL:WEIGHT)",
                      file=sys.stderr)
                if created:
                    spark.stop()
                raise SystemExit(2) from None
            if col not in docs.columns:
                print(f"error: --field column {col!r} not in input "
                      f"columns {docs.columns}", file=sys.stderr)
                if created:
                    spark.stop()
                raise SystemExit(2)
        idx = build_fielded_index(docs, fields, id_col=args.id_col,
                                  n_buckets=args.num_output_partitions,
                                  salt_hot_terms=True,
                                  tokenizer=args.tokenizer,
                                  analyzer=analyzer)
        ib.write_index(idx, args.output)
        from inverted_index_and_search_spark.metrics import write_run_metrics
        write_run_metrics(spark, args.output,
                          wall_seconds=time.perf_counter() - t0,
                          extra={"input": args.input, "format": "parquet",
                                 "fields": fields})
        print(f"index written to {args.output} (parquet, BM25F fields "
              f"{fields})")
        if created:
            spark.stop()
        return
    if args.format == "segments":
        # north-star layout: delta+varint compressed postings with
        # block-max metadata (positional iff --positional), queryable
        # warm via `search --index-format segments` (QueryServer)
        from pyspark.sql import functions as F

        from inverted_index_and_search_spark.operators import segments as seg

        if args.positional:
            from inverted_index_and_search_spark.operators.positional import (
                term_doc_positions_arrow,
            )
            tf = term_doc_positions_arrow(docs, content_col=args.content_col,
                                          id_col=args.id_col,
                                          tokenizer=args.tokenizer,
                                          analyzer=analyzer)
        else:
            tf = ib.term_doc_tf_arrow(docs, content_col=args.content_col,
                                      id_col=args.id_col,
                                      tokenizer=args.tokenizer,
                                      analyzer=analyzer)
        # persist BEFORE the stats collect: the avgdl aggregation and
        # the encode job otherwise each run the whole tokenize pipeline
        tf = tf.persist()
        n_docs = docs.count()
        avgdl = float(
            tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            .join(docs.select(F.col(args.id_col).alias("doc_id")),
                  "doc_id", "right").fillna({"dl": 0})
            .agg(F.avg("dl")).collect()[0][0] or 0.0)
        sidx = seg.build_segment_index(
            tf, n_docs, avgdl,
            n_buckets=args.num_output_partitions,
            hot=ib.hot_terms_from_docs(docs, content_col=args.content_col,
                                       id_col=args.id_col,
                                       tokenizer=args.tokenizer,
                                       analyzer=analyzer),
            tokenizer=args.tokenizer, analyzer=analyzer)
        seg.write_segment_index(sidx, args.output)
        tf.unpersist()
        from inverted_index_and_search_spark.metrics import write_run_metrics
        write_run_metrics(spark, args.output,
                          wall_seconds=time.perf_counter() - t0,
                          extra={"input": args.input, "format": args.format})
        print(f"index written to {args.output} (segments)")
        if created:
            spark.stop()
        return
    if args.positional:
        from inverted_index_and_search_spark.operators.positional import (
            build_positional_index,
        )
        idx = build_positional_index(docs, content_col=args.content_col,
                                     id_col=args.id_col,
                                     n_buckets=args.num_output_partitions,
                                     shard_hot_terms=True,
                                     tokenizer=args.tokenizer,
                                     analyzer=analyzer)
    else:
        idx = ib.build_index(docs, content_col=args.content_col,
                             id_col=args.id_col, salt_hot_terms=True,
                             n_buckets=args.num_output_partitions,
                             analyzer=analyzer,
                             tokenizer=args.tokenizer,
                             inline_dl=args.inline_dl)
    if args.format == "parquet":
        ib.write_index(idx, args.output, forward=args.forward)
    elif args.format == "text":
        # line sinks honor --num-output-partitions as the output FILE
        # count (reference coalesce/repartition of the rendered lines,
        # spark/inverted_index_search.py:223-231)
        ib.write_index_text(idx, args.output,
                            num_partitions=args.num_output_partitions)
    elif args.format in ("ref-parquet", "ref-parquet-nested"):
        # the reference's own two Parquet layouts (DF {word, docs} /
        # RDD {word, postings:[{doc,count}]}) — read back with
        # `search --index-format ref-parquet`
        ib.write_index_parquet_ref(idx, args.output,
                                   nested=args.format.endswith("nested"))
    else:
        ib.write_index_json(idx, args.output,
                            num_partitions=args.num_output_partitions)
    from inverted_index_and_search_spark.metrics import write_run_metrics
    # text/json sinks are flat line-file dirs a reader globs whole —
    # park the metrics artifact alongside, not inside, those
    mdir = args.output if args.format == "parquet" else f"{args.output}-metrics"
    write_run_metrics(spark, mdir,
                      wall_seconds=time.perf_counter() - t0,
                      extra={"input": args.input, "format": args.format})
    print(f"index written to {args.output} ({args.format})")
    if created:
        spark.stop()


def _resolve_keys(index: ib.Index,
                  doc_ids: list[int]) -> dict[int, str] | None:
    """doc_id -> original docID (filename) for THIS RESULT's docs only,
    on indexes parsed from reference-variant text output; None when ids
    are native. Display-time broadcast join against doc_stats — bounded
    by the result size, never a full doc_stats collect (which at corpus
    scale would materialize every doc row on the driver)."""
    if "doc_key" not in index.doc_stats.columns or not doc_ids:
        return None
    from pyspark.sql import functions as F

    spark = index.doc_stats.sparkSession
    ids = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    rows = (index.doc_stats.join(F.broadcast(ids), "doc_id")
            .select("doc_id", "doc_key").collect())
    return {r["doc_id"]: r["doc_key"] for r in rows}


def _run_query(index: ib.Index, line: str, bm25: bool, topk: int,
               phrase: bool = False, expr: bool = False,
               prefix: bool = False, fuzzy: int | None = None,
               meta=None, suggest: int | None = None,
               snip: tuple | None = None,
               complete: bool = False, rank: str | None = None,
               prf: bool = False, synonyms: dict | None = None,
               related: bool = False) -> bool:
    """Evaluate one query line and print results; returns False only on
    a malformed --expr query (one-shot callers exit nonzero on that)."""
    terms = line.split()
    if not terms:
        return True
    if getattr(index, "tokenizer", "standard") == "code" and not expr:
        # the index vocabulary is identifier-split (meta.json tokenizer
        # = code): query tokens must split the same way or they miss it.
        # "getFileName" becomes the term sequence [get, file, name] —
        # under --phrase that is exactly Lucene WDF semantics: the
        # phrase matches getFileName AND get_file_name occurrences.
        from inverted_index_and_search_spark.tokenizer import tokenizer_py
        tok = tokenizer_py("code")
        terms = [t for raw in terms for t in tok(raw)]
        if not terms:
            print("No matches found.")
            return True
    if related:
        # document-level PMI associations of the first token
        rows = q.related_terms(index, terms[0], k=topk).collect()
        if not rows:
            print("No related terms.")
        for r in rows:
            print(f"{r['term']}\t{r['co_df']}\t{r['pmi']:.6f}")
        return True
    if complete:
        # popularity-ranked autocomplete of the first token as a prefix
        rows = q.complete_terms(index, terms[0], k=topk).collect()
        if not rows:
            print("No completions.")
        for r in rows:
            print(f"{r['term']}\t{r['cf']}")
        return True
    if suggest is not None:
        # "did you mean": ranked dictionary terms near the first token
        rows = q.suggest_terms(index, terms[0], max_dist=suggest,
                               k=topk).collect()
        if not rows:
            print("No suggestions.")
        for r in rows:
            print(f"{r['term']}\t{r['dist']}\t{r['cf']}")
        return True
    if snip is not None:
        from inverted_index_and_search_spark.operators.snippets import (
            bm25_snippets,
        )

        docs, width, ccol, icol = snip
        rows = bm25_snippets(index, docs, terms, k=topk, width=width,
                             mark=("[", "]"), content_col=ccol,
                             id_col=icol).collect()
        if not rows:
            print("No matches found.")
        for r in rows:
            print(f"{r['doc_id']}\t{r['score']:.6f}\t{r['snippet']}")
        return True
    if prefix or fuzzy is not None:
        if prefix:
            rows = q.prefix_docs(index, terms[0]).collect()
        else:
            rows = q.fuzzy_docs(index, terms[0], fuzzy).collect()
        key_map = _resolve_keys(index, [r["doc_id"] for r in rows])

        def show_d(doc_id: int) -> str:
            return (key_map.get(doc_id, str(doc_id)) if key_map
                    else str(doc_id))

        if not rows:
            print("No matches found.")
        else:
            print("\n".join(show_d(r["doc_id"]) for r in rows))
        return True

    def keyed(rows) -> dict[int, str] | None:
        return _resolve_keys(index, [r["doc_id"] for r in rows])

    key_map: dict[int, str] | None = None

    def show(doc_id: int) -> str:
        return key_map.get(doc_id, str(doc_id)) if key_map else str(doc_id)

    if expr:
        from inverted_index_and_search_spark.operators import search_expr as se

        try:
            if bm25:
                rows = se.search_expr_ranked(index, line, k=topk,
                                             meta=meta).collect()
            else:
                rows = se.search_expr(index, line, meta=meta).collect()
        except se.ExprError as e:
            print(f"error: {e}", file=sys.stderr)
            return False
        key_map = keyed(rows)
        if not rows:
            print("No matches found.")
        elif bm25:
            for r in rows:
                print(f"{show(r['doc_id'])}\t{r['score']:.6f}")
        else:
            print("\n".join(show(r["doc_id"]) for r in rows))
        return True
    if phrase:
        from inverted_index_and_search_spark.operators import positional as pos

        if index.analyzer is not None and not index.analyzer.is_identity:
            # analyzed positional index: positions are POST-analysis
            # (renumbered), so the analyzed phrase matches across
            # removed stopwords — one analyzer, both sides
            terms = index.analyzer.analyze_terms(terms)
            if not terms:
                print("No matches found.")
                return True
        if bm25:
            rows = pos.phrase_bm25_topk(index, terms, k=topk).collect()
            key_map = keyed(rows)
            if not rows:
                print("No matches found.")
            for r in rows:
                print(f"{show(r['doc_id'])}\t{r['score']:.6f}")
        else:
            rows = pos.phrase_match(index, terms).collect()
            key_map = keyed(rows)
            if not rows:
                print("No matches found.")
            for r in rows:
                print(f"{show(r['doc_id'])}\t{r['phrase_tf']}")
        return True
    if index.analyzer is not None and not index.analyzer.is_identity:
        # the index was built with an analyzer (meta.json): query terms
        # must pass the same stopword/stem transform to hit its
        # vocabulary (Lucene convention: one analyzer, both sides)
        terms = index.analyzer.analyze_terms(terms)
        if not terms:
            print("No matches found.")
            return True
    if bm25 or rank is not None or prf or synonyms is not None:
        from inverted_index_and_search_spark.operators import ranking as rk

        if synonyms is not None:
            rows = rk.synonym_bm25_topk(index, terms, synonyms,
                                        k=topk).collect()
        elif prf:
            # RM3-shape pseudo-relevance feedback (BM25 base ranker)
            rows = rk.bm25_prf_topk(index, terms, k=topk).collect()
        elif rank == "qld":
            rows = rk.qld_topk(index, terms, k=topk).collect()
        elif rank == "tfidf":
            rows = rk.classic_tfidf_topk(index, terms, k=topk).collect()
        else:
            rows = q.bm25_topk(index, terms, k=topk).collect()
        key_map = keyed(rows)
        if not rows:
            print("No matches found.")
        for r in rows:
            print(f"{show(r['doc_id'])}\t{r['score']:.6f}")
    else:
        rows = q.boolean_and(index, terms).collect()
        key_map = keyed(rows)
        if not rows:
            # reference wording, search-query.py:62
            print("No matches found.")
        else:
            print("\n".join(show(r["doc_id"]) for r in rows))
    return True


def _run_query_server(server, line: str, bm25: bool, topk: int,
                      phrase: bool, expr: bool = False,
                      prefix: bool = False, fuzzy: int | None = None,
                      suggest: int | None = None,
                      snip: tuple | None = None,
                      complete: bool = False,
                      rank: str | None = None) -> bool:
    """One query against a warm QueryServer (compressed segments):
    repeat terms answer from the per-term cache in microseconds —
    the scale-valid interactive path (no full-index residency).
    Returns False only on a malformed --expr query."""
    terms = line.split()
    if not terms:
        return True
    if server.idx.tokenizer == "code" and not expr:
        # code-built segment vocabulary: split query identifiers the
        # same way (see _run_query — same Lucene-WDF phrase semantics)
        from inverted_index_and_search_spark.tokenizer import tokenizer_py
        tok = tokenizer_py("code")
        terms = [t for raw in terms for t in tok(raw)]
        if not terms:
            print("No matches found.")
            return True
    if complete:
        from inverted_index_and_search_spark.operators import segments as seg

        comps = seg.complete_terms(server.idx, terms[0], k=topk)
        if not comps:
            print("No completions.")
        for t, c in comps:
            print(f"{t}\t{c}")
        return True
    if suggest is not None:
        # warm "did you mean": memoized dictionary match per typo
        sugs = server.suggest(terms[0], max_dist=suggest, k=topk)
        if not sugs:
            print("No suggestions.")
        for t, d, c in sugs:
            print(f"{t}\t{d}\t{c}")
        return True
    if prefix or fuzzy is not None:
        # segment dictionary scan (memoized per server) + per-term cache
        if prefix:
            ids = server.prefix_docs(terms[0])
        else:
            ids = server.fuzzy_docs(terms[0], fuzzy)
        if not ids:
            print("No matches found.")
        else:
            print("\n".join(str(d) for d in ids))
        return True
    if server.idx.analyzer is not None \
            and not server.idx.analyzer.is_identity:
        # stats.json carried the build analyzer: same transform on the
        # query side (raw-fragment modes — complete/suggest/prefix —
        # already returned above, mirroring the DataFrame path);
        # snippets below rank AND mark with the analyzed terms
        terms = server.idx.analyzer.analyze_terms(terms)
        if not terms:
            print("No matches found.")
            return True
    if snip is not None:
        from inverted_index_and_search_spark.operators.snippets import (
            snippets_for_ranked,
        )

        docs, width, ccol, icol = snip
        ranked = server.bm25_topk(terms, k=topk)
        rows = snippets_for_ranked(docs, ranked, terms, width=width,
                                   mark=("[", "]"), content_col=ccol,
                                   id_col=icol,
                                   analyzer=server.idx.analyzer,
                                   tokenizer=getattr(server.idx, "tokenizer",
                                                     "standard")).collect()
        if not rows:
            print("No matches found.")
        for r in rows:
            print(f"{r['doc_id']}\t{r['score']:.6f}\t{r['snippet']}")
        return True
    if expr:
        from inverted_index_and_search_spark.operators.search_expr import (
            ExprError,
        )

        try:
            if bm25:
                hits = server.search_expr_ranked(line, k=topk)
                if not hits:
                    print("No matches found.")
                for d, s in hits:
                    print(f"{d}\t{s:.6f}")
            else:
                ids = server.search_expr(line)
                if not ids:
                    print("No matches found.")
                else:
                    print("\n".join(str(d) for d in ids))
        except ExprError as e:
            print(f"error: {e}", file=sys.stderr)
            return False
        return True
    if phrase:
        if bm25:
            hits = server.phrase_topk(terms, k=topk)
            if not hits:
                print("No matches found.")
            for d, s in hits:
                print(f"{d}\t{s:.6f}")
        else:
            rows = server.phrase_match(terms)
            if not rows:
                print("No matches found.")
            for d, ptf in rows:
                print(f"{d}\t{ptf}")
    elif bm25 or rank is not None:
        if rank in ("qld", "tfidf"):
            # warm alternate models from the same per-term cursor cache
            hits = server.model_topk(terms, k=topk, model=rank)
        else:
            hits = server.bm25_topk(terms, k=topk)
        if not hits:
            print("No matches found.")
        for d, s in hits:
            print(f"{d}\t{s:.6f}")
    else:
        ids = server.boolean_and(terms)
        if not ids:
            print("No matches found.")
        else:
            print("\n".join(str(d) for d in ids))
    return True


def _run_batch(spark, created: bool, args: argparse.Namespace) -> None:
    """Offline batch evaluation: one query per line in --queries-file,
    evaluated ON EXECUTORS via the distributed batch kernels (segments
    layout required); prints `query_id \\t rank \\t doc_id \\t score`
    lines. Query ids are 0-based input line numbers; queries whose
    terms are all absent print nothing (documented batch contract)."""
    from inverted_index_and_search_spark.operators import segments as seg

    if args.index_format != "segments":
        print("error: --queries-file needs --index-format segments "
              "(build with --format segments)", file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    if args.expr or args.prefix or args.fuzzy is not None:
        print("error: --queries-file evaluates term/phrase queries; "
              "--expr/--prefix/--fuzzy are interactive/one-shot only",
              file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    idx = seg.read_segment_index(spark, args.index)
    if args.phrase and "positions_enc" not in idx.segments.columns:
        print("error: --phrase needs positional segments "
              "(build with --positional)", file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    with open(args.queries_file, encoding="utf-8") as f:
        queries = [(i, ln.split()) for i, ln in enumerate(f)
                   if ln.split()]
    if args.phrase:
        res = seg.batch_phrase_topk(idx, queries, k=args.topk)
    else:
        res = seg.batch_topk(idx, queries, k=args.topk,
                             conjunctive=not args.bm25)
    for r in res.orderBy("query_id", "rank").collect():
        print(f"{r['query_id']}\t{r['rank']}\t{r['doc_id']}"
              f"\t{r['score']:.6f}")
    if created:
        spark.stop()


def _search_segments(spark, created: bool, args: argparse.Namespace) -> None:
    from inverted_index_and_search_spark.operators import segments as seg

    server = seg.QueryServer(seg.read_segment_index(spark, args.index),
                             meta=_load_meta(spark, args))
    if args.prf or args.related or args.synonyms or args.mlt is not None:
        # PRF expansion, PMI association and more-like-this all need a
        # doc->terms profile scan, which the segment layout serves only
        # via Spark — the warm server has no forward layout; synonym-
        # group scoring over segments is DataFrame-path work for now.
        # DataFrame formats only (parquet builds with --forward make
        # the profile a point lookup).
        print("error: --prf/--related/--synonyms/--mlt need a DataFrame "
              "index format (parquet/text/json/ref-parquet)",
              file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    if args.phrase and "positions_enc" not in server.idx.segments.columns:
        print("error: --phrase needs positional segments "
              "(build with --positional)", file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    snip = _snip_ctx(spark, created, args)
    if args.query is not None:
        ok = _run_query_server(server, args.query, args.bm25, args.topk,
                               args.phrase, expr=args.expr,
                               prefix=args.prefix, fuzzy=args.fuzzy,
                               suggest=args.suggest, snip=snip,
                               complete=args.complete, rank=args.rank)
        if not ok:
            if created:
                spark.stop()
            raise SystemExit(2)
    else:
        try:
            while True:
                line = input("> ")
                _run_query_server(server, line, args.bm25, args.topk,
                                  args.phrase, expr=args.expr,
                                  prefix=args.prefix, fuzzy=args.fuzzy,
                                  suggest=args.suggest, snip=snip,
                                  complete=args.complete, rank=args.rank)
        except EOFError:
            pass
    if created:
        spark.stop()


def _load_synonyms(path: str | None) -> dict[str, list[str]] | None:
    """Parse a thesaurus file: one ``term: syn1, syn2`` (or ``term =
    syn1, syn2``) line per term; '#' comments and blank lines skipped."""
    if path is None:
        return None
    out: dict[str, list[str]] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line:
                continue
            head, sep, rest = line.replace("=", ":", 1).partition(":")
            if not sep:
                continue
            syns = [s.strip().lower() for s in rest.split(",") if s.strip()]
            if syns:
                out[head.strip().lower()] = syns
    return out


def _load_meta(spark, args: argparse.Namespace):
    """The --meta-parquet relation for --expr field atoms (or None)."""
    if getattr(args, "meta_parquet", None) is None:
        return None
    return spark.read.parquet(args.meta_parquet)


def _snip_ctx(spark, created: bool,
              args: argparse.Namespace) -> tuple | None:
    """(docs, width, content_col, id_col) for --snippets, or None.
    Snippets need the stored-fields side (the index holds no text), so
    --docs-parquet is required with --snippets."""
    if getattr(args, "snippets", None) is None:
        return None
    if args.docs_parquet is None:
        print("error: --snippets needs --docs-parquet (the documents "
              "table holding the original text)", file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    docs = spark.read.parquet(args.docs_parquet)
    return (docs, args.snippets, args.docs_content_col, args.docs_id_col)


def _print_stats(stats: dict) -> None:
    for key in ("n_docs", "avgdl", "n_terms", "n_postings", "n_tokens"):
        v = stats[key]
        print(f"{key}\t{v:.6f}" if isinstance(v, float) else f"{key}\t{v}")
    for term, cf in stats["top_terms"]:
        print(f"top\t{term}\t{cf}")


def _stats(args: argparse.Namespace) -> None:
    """`stats` subcommand: corpus/index summary for any layout —
    n_docs, avgdl, term/posting/token counts and the top terms by
    collection frequency. Narrow scans only (no postings payloads)."""
    spark, created = _session("iis-stats")
    if args.index_format == "segments":
        from inverted_index_and_search_spark.operators import segments as seg

        stats = seg.segment_stats(seg.read_segment_index(spark, args.index),
                                  top=args.top)
    else:
        if args.index_format == "text":
            index = ib.read_index_text(spark, args.index)
        elif args.index_format == "json":
            index = ib.read_index_json(spark, args.index)
        elif args.index_format == "ref-parquet":
            index = ib.read_index_parquet_ref(spark, args.index)
        else:
            index = ib.read_index(spark, args.index)
        stats = q.index_stats(index, top=args.top)
    _print_stats(stats)
    if created:
        spark.stop()


def _search(args: argparse.Namespace) -> None:
    spark, created = _session("iis-search")
    if args.queries_file is not None:
        _run_batch(spark, created, args)
        return
    if args.index_format == "segments":
        # north-star compressed layout -> warm QueryServer (per-term
        # on-demand cache; never materializes the index)
        _search_segments(spark, created, args)
        return
    if args.index_format == "text":
        # reference-variant interchange: consume a `term\tdoc:tf...`
        # text index from any builder (search-query.py:75-90 parity)
        index = ib.read_index_text(spark, args.index)
    elif args.index_format == "json":
        index = ib.read_index_json(spark, args.index)
    elif args.index_format == "ref-parquet":
        # either reference Parquet layout, auto-detected from schema
        index = ib.read_index_parquet_ref(spark, args.index)
    else:
        index = ib.read_index(spark, args.index)
    # Warm only the SMALL side: doc_stats + collection stats. Caching
    # the postings table here (round-2 behavior) forced a full scan and
    # full-RAM materialization of the index before the first query —
    # an OOM/minutes-long startup at corpus scale that defeated the
    # engine's own bucket pruning. Per-query `_query_postings` prunes
    # the parquet scan to the query's terms' buckets uncached, and the
    # warm-latency path is QueryServer's per-term on-demand cache.
    index.doc_stats.cache()
    index.collection_stats()
    if args.phrase:
        post_t = index.postings.schema["postings"].dataType.elementType
        if "positions" not in post_t.fieldNames():
            print("error: --phrase needs a positional index "
                  "(build with --positional)", file=sys.stderr)
            if created:
                spark.stop()
            raise SystemExit(2)
    meta = _load_meta(spark, args)
    snip = _snip_ctx(spark, created, args)
    if args.mlt is not None:
        rows = q.more_like_this(index, args.mlt, k_terms=10,
                                k=args.topk).collect()
        if not rows:
            print("No matches found.")
        for r in rows:
            print(f"{r['doc_id']}\t{r['score']:.6f}")
        if created:
            spark.stop()
        return
    if args.query is not None:
        ok = _run_query(index, args.query, args.bm25, args.topk,
                        phrase=args.phrase, expr=args.expr,
                        prefix=args.prefix, fuzzy=args.fuzzy, meta=meta,
                        suggest=args.suggest, snip=snip,
                        complete=args.complete, rank=args.rank,
                        prf=args.prf,
                        synonyms=_load_synonyms(args.synonyms),
                        related=args.related)
        if not ok:
            # scripts must see malformed one-shot expressions fail
            if created:
                spark.stop()
            raise SystemExit(2)
    else:
        # reference REPL loop, search-query.py:120-131 (parse errors
        # print and the loop continues — interactive semantics)
        syn_map = _load_synonyms(args.synonyms)
        try:
            while True:
                line = input("> ")
                _run_query(index, line, args.bm25, args.topk,
                           phrase=args.phrase, expr=args.expr,
                           prefix=args.prefix, fuzzy=args.fuzzy,
                           meta=meta, suggest=args.suggest, snip=snip,
                           complete=args.complete, rank=args.rank,
                           prf=args.prf, synonyms=syn_map,
                           related=args.related)
        except EOFError:
            pass
    if created:
        spark.stop()


def _load_docs_arg(spark, paths: list[str], glob: str):
    """Shared input loader for corpus-shaped positional inputs: parquet
    dataset(s) or raw text dirs, auto-detected (same rules as build)."""
    if all(_looks_like_parquet(p) for p in paths):
        from functools import reduce

        from inverted_index_and_search_spark.sources.catalog import (
            load_documents,
        )
        dfs = [load_documents(spark, p) for p in paths]
        docs, content_col = reduce(lambda a, b: a.unionByName(b), dfs), None
    else:
        from inverted_index_and_search_spark.sources.files import (
            docs_from_files,
        )
        docs, content_col = docs_from_files(spark, paths, glob=glob), "content"
    return docs, content_col


def _grep_build(args: argparse.Namespace) -> None:
    """`grep-build`: persist the trigram substring/regex index."""
    from inverted_index_and_search_spark.operators import grep

    spark, created = _session("iis-grep-build")
    import time

    docs, auto_content = _load_docs_arg(spark, args.input, args.glob)
    content_col = auto_content or args.content_col
    id_col = "doc_id" if auto_content else args.id_col
    if id_col not in docs.columns:
        from inverted_index_and_search_spark.corpus import with_doc_id
        docs = with_doc_id(docs)
        id_col = "doc_id"
    t0 = time.perf_counter()
    build = (grep.build_trigram_segments if args.compressed
             else grep.build_trigram_index)
    tidx = build(docs, content_col=content_col, id_col=id_col,
                 n_buckets=args.num_output_partitions,
                 case_insensitive=args.ignore_case)
    grep.write_trigram_index(tidx, args.output)
    print(f"trigram index written to {args.output} "
          f"({args.num_output_partitions} buckets, "
          f"case_insensitive={args.ignore_case}, "
          f"compressed={args.compressed}) "
          f"in {time.perf_counter() - t0:.2f}s")
    if created:
        spark.stop()


def _grep(args: argparse.Namespace) -> None:
    """`grep`: substring/regex search via the trigram index."""
    from inverted_index_and_search_spark.operators import grep

    spark, created = _session("iis-grep")
    tidx = grep.read_trigram_index(spark, args.index)
    if args.ignore_case and not tidx.case_insensitive:
        print("error: --ignore-case needs an index built with "
              "grep-build --ignore-case", file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    docs, auto_content = _load_docs_arg(spark, args.docs, args.glob)
    content_col = auto_content or args.content_col
    id_col = "doc_id" if auto_content else args.id_col
    kw = dict(content_col=content_col, id_col=id_col,
              max_grams=args.max_grams)
    if args.pattern is None:
        # interactive REPL on the warm GrepServer: repeat needles run
        # prefilter + verification from the per-gram / per-doc caches
        # (milliseconds, no Spark job); `re:PATTERN` lines are regexes
        server = grep.GrepServer(tidx, docs, content_col=content_col,
                                 id_col=id_col)
        try:
            while True:
                line = input("grep> ")
                if not line.strip():
                    continue
                if line.startswith("re:"):
                    hits = server.regex(line[3:], max_grams=args.max_grams)
                elif args.count:
                    hits = [f"{d}\t{n}" for d, n in server.substring(
                        line, count_occurrences=True,
                        fold_case=args.ignore_case,
                        max_grams=args.max_grams)]
                else:
                    hits = server.substring(line,
                                            fold_case=args.ignore_case,
                                            max_grams=args.max_grams)
                for h in hits:
                    print(h)
                if not hits:
                    print("No matches found.")
        except EOFError:
            pass
        if created:
            spark.stop()
        return
    if args.regex:
        # --ignore-case folds the match via an embedded (?i) flag; the
        # literal-gram prefilter stays sound because the CI index (the
        # flag is rejected above without one) stores folded grams and
        # regex_search folds required literals against it
        pat = f"(?i){args.pattern}" if args.ignore_case else args.pattern
        rows = grep.regex_search(tidx, docs, pat, **kw) \
            .orderBy("doc_id").collect()
        for r in rows:
            print(r["doc_id"])
    elif args.lines:
        rows = grep.matching_lines(tidx, docs, args.pattern,
                                   fold_case=args.ignore_case, **kw) \
            .orderBy("doc_id", "line_no").collect()
        for r in rows:
            print(f"{r['doc_id']}:{r['line_no']}:{r['line']}")
    else:
        rows = grep.substring_search(tidx, docs, args.pattern,
                                     count_occurrences=args.count,
                                     fold_case=args.ignore_case, **kw) \
            .orderBy("doc_id").collect()
        for r in rows:
            print(f"{r['doc_id']}\t{r['n_hits']}" if args.count
                  else r["doc_id"])
    if not rows:
        print("No matches found.")
    if created:
        spark.stop()


def _symbols_build(args: argparse.Namespace) -> None:
    """`symbols-build`: extract a ctags-style definition index."""
    from inverted_index_and_search_spark.operators import symbols as sy

    spark, created = _session("iis-symbols-build")
    docs, auto_content = _load_docs_arg(spark, args.input, "*")
    content_col = auto_content or args.content_col
    if args.lang_col not in docs.columns:
        print(f"error: --lang-col {args.lang_col!r} not in input columns "
              f"{docs.columns} (symbol patterns are per-language)",
              file=sys.stderr)
        if created:
            spark.stop()
        raise SystemExit(2)
    id_col = "doc_id" if auto_content else args.id_col
    if id_col not in docs.columns:
        from inverted_index_and_search_spark.corpus import with_doc_id
        docs = with_doc_id(docs)
        id_col = "doc_id"
    syms = sy.extract_symbols(docs, content_col=content_col, id_col=id_col,
                              lang_col=args.lang_col)
    sy.write_symbol_index(syms, args.output,
                          n_buckets=args.num_output_partitions)
    print(f"symbol index written to {args.output}")
    if created:
        spark.stop()


def _symbols(args: argparse.Namespace) -> None:
    """`symbols`: definition lookup over a symbols-build index."""
    from inverted_index_and_search_spark.operators import symbols as sy

    spark, created = _session("iis-symbols")
    back, nb = sy.read_symbol_index(spark, args.index)
    if args.prefix:
        rows = sy.symbol_search(back, args.name, kind=args.kind,
                                prefix=True) \
            .select("doc_id", "lang", "kind", "symbol", "line_no") \
            .orderBy("symbol", "doc_id", "line_no").collect()
    else:
        rows = sy.symbol_lookup(back, nb, args.name, kind=args.kind) \
            .orderBy("doc_id", "line_no").collect()
    for r in rows:
        print(f"{r['doc_id']}:{r['line_no']}\t{r['kind']}\t{r['symbol']}"
              f"\t{r['lang']}")
    if not rows:
        print("No definitions found.")
    if created:
        spark.stop()


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="inverted_index_and_search_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, nargs="+",
                   help="parquet documents table(s) OR directories of raw "
                        "text files (auto-detected; see --input-format); "
                        "multiple paths union like the reference's "
                        "--input-folder/--input-texts")
    b.add_argument("--num-output-partitions", type=int,
                   default=ib.DEFAULT_BUCKETS,
                   help="term-hash bucket count of the index layout "
                        "(reference --num-output-partitions; persisted in "
                        "meta.json and used for query-time pruning)")
    b.add_argument("--input-format", choices=["auto", "parquet", "text-dir"],
                   default="auto")
    b.add_argument("--glob", default="*.txt",
                   help="filename glob for text-dir input (reference "
                        ".txt predicate); use '*' for all files")
    b.add_argument("--output", required=True)
    b.add_argument("--content-col", default="content")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--limit-mb", type=float, default=None,
                   help="greedy largest-first input cap (reference --limit-mb)")
    b.add_argument("--format", choices=["parquet", "text", "json",
                                        "segments", "ref-parquet",
                                        "ref-parquet-nested"],
                   default="parquet",
                   help="'segments' writes the compressed delta+varint "
                        "block-max layout (query with --index-format "
                        "segments; positional iff --positional); "
                        "'ref-parquet[-nested]' writes the reference's "
                        "own Parquet layouts ({word, docs} / "
                        "{word, postings:[{doc,count}]})")
    b.add_argument("--stopwords", default=None, metavar="PATH",
                   help="index-time stopword list (one term per line); "
                        "works with every layout incl. --positional/"
                        "--field/segments (positions are POST-analysis, "
                        "Lucene renumbering); persisted in meta/stats"
                        ".json and auto-applied to query terms")
    b.add_argument("--tokenizer", choices=["standard", "code"],
                   default="standard",
                   help="term semantics: standard (reference parity) or "
                        "code (split camelCase/snake_case/digit "
                        "identifiers); works with every layout incl. "
                        "--positional/--field/segments; persisted in "
                        "meta/stats.json and applied to query terms "
                        "automatically")
    b.add_argument("--stem", action="store_true",
                   help="index-time S-stemming (Harman 1991 plural "
                        "stemmer); persisted and auto-applied to "
                        "query terms")
    b.add_argument("--positional", action="store_true",
                   help="store per-(term,doc) token positions — enables "
                        "`search --phrase`; all other queries work "
                        "unchanged on the positional layout")
    b.add_argument("--forward", action="store_true",
                   help="also persist the doc-bucketed FORWARD layout "
                        "(doc -> terms access path): more-like-this / "
                        "related-terms / PRF profile stages become "
                        "partition-pruned point lookups (parquet "
                        "format, non-fielded builds)")
    b.add_argument("--inline-dl", action="store_true",
                   help="carry each doc's length inside its posting "
                        "structs so BM25/QLD/TF-IDF scoring needs no "
                        "doc_stats broadcast (parquet format, "
                        "non-positional, non-fielded builds)")
    b.add_argument("--field", action="append", default=None,
                   metavar="COL:WEIGHT",
                   help="BM25F fielded build (repeatable): index the "
                        "weighted union of several document columns, "
                        "e.g. --field path:3 --field content:1 — "
                        "queries on the result score BM25F; parquet "
                        "layout only (weighted tf is fractional)")
    b.set_defaults(fn=_build)

    s = sub.add_parser("search", help="query a built index")
    s.add_argument("--index", required=True)
    s.add_argument("--index-format",
                   choices=["parquet", "text", "json", "segments",
                            "ref-parquet"],
                   default="parquet",
                   help="'text' consumes a reference-wire-format "
                        "term\\tdoc:tf index from any variant; 'json' "
                        "consumes the {word, docs:[...]} JSON sink; "
                        "'ref-parquet' consumes EITHER reference "
                        "Parquet layout (auto-detected); 'segments' "
                        "serves the compressed layout warm via the "
                        "per-term QueryServer cache")
    s.add_argument("--query", default=None,
                   help="one-shot query; omit for an interactive REPL")
    s.add_argument("--queries-file", default=None,
                   help="batch mode: one query per line, evaluated ON "
                        "EXECUTORS (needs --index-format segments); "
                        "prints query_id\\trank\\tdoc_id\\tscore with "
                        "0-based line-number ids; conjunctive ranked "
                        "by default, disjunctive BM25 with --bm25, "
                        "exact phrases with --phrase")
    s.add_argument("--synonyms", default=None, metavar="PATH",
                   help="query-time thesaurus file (one 'term: syn1, "
                        "syn2' line per term); ranked search scores "
                        "synonym groups with Lucene SynonymQuery "
                        "semantics (sum tf, max df)")
    s.add_argument("--related", action="store_true",
                   help="print the first query token's top related "
                        "terms by document-level PMI instead of "
                        "searching")
    s.add_argument("--mlt", type=int, default=None, metavar="DOC_ID",
                   help="more-like-this: rank documents similar to "
                        "DOC_ID (no query text needed; the profile "
                        "stage uses the forward layout when the index "
                        "carries one — build --forward)")
    s.add_argument("--rank", choices=["bm25", "qld", "tfidf"],
                   default=None,
                   help="ranking model for ranked search: BM25 "
                        "(default), Dirichlet query likelihood, or "
                        "Lucene-classic TF-IDF")
    s.add_argument("--prf", action="store_true",
                   help="pseudo-relevance feedback (RM3 shape): expand "
                        "the query with the top terms of the BM25 "
                        "feedback docs, then rescore")
    s.add_argument("--bm25", action="store_true",
                   help="ranked BM25 instead of boolean AND")
    s.add_argument("--phrase", action="store_true",
                   help="treat the query as an exact token phrase "
                        "(requires an index built with --positional); "
                        "prints doc\\tphrase_tf, or ranked with --bm25")
    s.add_argument("--expr", action="store_true",
                   help="boolean query language: AND/OR/NOT, parens, "
                        '"exact phrases" (phrases need --positional '
                        "indexes), a NEAR/3 b proximity, tab* prefix "
                        "and term~1 fuzzy atoms, lang:de metadata "
                        "field filters (need --meta-parquet); bare "
                        "term lists still mean AND")
    s.add_argument("--meta-parquet", default=None, metavar="PATH",
                   help="corpus/metadata parquet (doc_id + metadata "
                        "columns, one row per doc) that --expr field "
                        "atoms like lang:de filter against")
    s.add_argument("--prefix", action="store_true",
                   help="treat the query's first token as a term PREFIX "
                        "(Lucene PrefixQuery): print docs containing any "
                        "matching dictionary term")
    s.add_argument("--fuzzy", type=int, default=None, metavar="D",
                   help="treat the query's first token as a FUZZY term: "
                        "print docs containing any dictionary term "
                        "within Levenshtein distance D")
    s.add_argument("--complete", action="store_true",
                   help="autocomplete: print up to --topk dictionary "
                        "terms extending the query's first token as a "
                        "prefix, ranked by collection frequency "
                        "(term\\tcf lines)")
    s.add_argument("--suggest", type=int, default=None, metavar="D",
                   help='"did you mean" spell correction: print up to '
                        "--topk dictionary terms within Levenshtein "
                        "distance D of the query's first token, ranked "
                        "dist asc then collection frequency desc "
                        "(term\\tdist\\tcf lines)")
    s.add_argument("--snippets", type=int, default=None, metavar="W",
                   help="BM25-ranked results with a best-window snippet "
                        "of W tokens (matched terms bracketed); "
                        "requires --docs-parquet for the stored text")
    s.add_argument("--docs-parquet", default=None, metavar="PATH",
                   help="documents table with the original text "
                        "(--snippets fetches only the ranked ids from "
                        "it — pushed IN filter, no full scan)")
    s.add_argument("--docs-content-col", default="content")
    s.add_argument("--docs-id-col", default="doc_id")
    s.add_argument("--topk", type=int, default=10)
    s.set_defaults(fn=_search)

    gb = sub.add_parser(
        "grep-build",
        help="build the trigram substring/regex index (Cox/Zoekt design)")
    gb.add_argument("--input", required=True, nargs="+",
                    help="documents parquet table(s) or raw text dirs "
                         "(auto-detected, same rules as build)")
    gb.add_argument("--output", required=True)
    gb.add_argument("--glob", default="*.txt")
    gb.add_argument("--content-col", default="content")
    gb.add_argument("--id-col", default="doc_id")
    gb.add_argument("--num-output-partitions", type=int,
                    default=ib.DEFAULT_BUCKETS,
                    help="gram-hash bucket count (query-time pruning)")
    gb.add_argument("--ignore-case", action="store_true",
                    help="index lower(content) grams: enables "
                         "`grep --ignore-case` (persisted in meta.json)")
    gb.add_argument("--compressed", action="store_true",
                    help="delta+varint per-(gram,shard) doc-id lists "
                         "instead of flat rows (~an order of magnitude "
                         "smaller on disk; hot grams sharded); queries "
                         "work unchanged")
    gb.set_defaults(fn=_grep_build)

    g = sub.add_parser(
        "grep", help="exact-substring / regex search over raw content "
                     "via a grep-build index")
    g.add_argument("pattern", nargs="?", default=None,
                   help="substring needle (default) or, with --regex, "
                        "a Java regex; omit for an interactive REPL on "
                        "the warm GrepServer (per-gram + per-doc "
                        "caches; `re:PAT` lines are regexes)")
    g.add_argument("--index", required=True, help="grep-build output dir")
    g.add_argument("--docs", required=True, nargs="+",
                   help="the raw documents (parquet or text dirs) — "
                        "candidate verification reads only matching "
                        "docs' content from here")
    g.add_argument("--glob", default="*.txt")
    g.add_argument("--content-col", default="content")
    g.add_argument("--id-col", default="doc_id")
    g.add_argument("--regex", action="store_true",
                   help="treat PATTERN as a regex: required literal "
                        "runs prefilter via the gram index, candidates "
                        "verify with rlike")
    g.add_argument("--count", action="store_true",
                   help="print doc_id\\tn_occurrences instead of doc_id")
    g.add_argument("--lines", action="store_true",
                   help="print doc_id:line_no:line for matching lines "
                        "(grep output shape)")
    g.add_argument("--ignore-case", action="store_true",
                   help="case-insensitive substring match (needs a "
                        "grep-build --ignore-case index)")
    g.add_argument("--max-grams", type=int, default=8,
                   help="rarest-gram prefilter width (default 8)")
    g.set_defaults(fn=_grep)

    sb = sub.add_parser(
        "symbols-build",
        help="extract a ctags-style per-language definition index")
    sb.add_argument("--input", required=True, nargs="+",
                    help="documents parquet table(s) with a language "
                         "column (the north-star corpus shape)")
    sb.add_argument("--output", required=True)
    sb.add_argument("--content-col", default="content")
    sb.add_argument("--id-col", default="doc_id")
    sb.add_argument("--lang-col", default="lang")
    sb.add_argument("--num-output-partitions", type=int,
                    default=ib.DEFAULT_BUCKETS)
    sb.set_defaults(fn=_symbols_build)

    sy = sub.add_parser(
        "symbols", help="definition lookup (doc:line kind symbol lang)")
    sy.add_argument("name", help="symbol name (exact; see --prefix)")
    sy.add_argument("--index", required=True,
                    help="symbols-build output dir")
    sy.add_argument("--kind", default=None,
                    help="restrict to a definition kind "
                         "(function/class/struct/...)")
    sy.add_argument("--prefix", action="store_true",
                    help="treat NAME as a prefix")
    sy.set_defaults(fn=_symbols)

    st = sub.add_parser("stats", help="print index summary statistics")
    st.add_argument("--index", required=True)
    st.add_argument("--index-format",
                    choices=["parquet", "text", "json", "segments",
                             "ref-parquet"], default="parquet")
    st.add_argument("--top", type=int, default=10,
                    help="how many top-cf terms to print")
    st.set_defaults(fn=_stats)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main(sys.argv[1:])
