"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: encode the sf0.001 documents table with the
engine's auto-selected codecs, verify decode bit-identity in-flight,
return a per-column codec/compression summary.

queries()/oracle_sql() — one entry per operator family from SURVEY.md §2
plus the north-rule codecs and training-data ops; every query runs the
compressed-vec engine inside Spark (vectorized encode + compressed-domain
filtering in mapInPandas) and is checked against plain ANSI SQL on DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from compressed_vec_spark.spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.flagship_encode_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver checks at most the FIRST 50 entries
    # per round (dict order).  The front of this dict therefore carries
    # (a) every entry that had not yet earned a green driver row by r4
    # (entries 51-74 of the r4 dict: 12 never-checked r4 additions plus
    # 12 r3-green entries that went stale), (b) the r4 red row
    # encoded_table_null_count with its determinism fix, (c) the new r5
    # entries, then (d) core reference-parity rows.  Long-green storage
    # rows rotate to the back; all 74+ remain covered by the local
    # oracle mirror (tests/test_entry_oracle.py).
    return {
        # --- never driver-checked before r5 (added in r4) ---
        "near_dup_clusters": q.near_dup_clusters,
        "dedup_keep_best": q.dedup_keep_best,
        "semantic_dedup_clusters": q.semantic_dedup_clusters,
        # as-of join: click -> latest prior view per user, one shuffle
        "events_asof_join": q.events_asof_join,
        # url canonicalization dedup (web-corpus first pass); JVM
        # regexp built-ins, oracle re-derives in SQL
        "url_canonical_dedup": q.url_canonical_dedup,
        # PII scrubbing pass: byte-exact scrubbed text vs the oracle
        "pii_scrub": q.pii_scrub,
        # Gopher-rules quality signal: within-doc token repetition
        "repetition_ratio": q.repetition_ratio,
        # corpus-frequency boilerplate line removal, byte-exact
        "boilerplate_removal": q.boilerplate_removal,
        # benchmark decontamination: 13-gram overlap vs the eval set
        "decontaminate_ngram_overlap": q.decontaminate_ngram_overlap,
        # C4-style line-level cleaning, byte-exact cleaned pages
        "c4_line_filter": q.c4_line_filter,
        # Gopher quality rules as exact integer signals + pass flag
        "gopher_quality_flags": q.gopher_quality_flags,
        # exact repeated-span removal (substring dedup, Lee et al.)
        "duplicate_span_removal": q.duplicate_span_removal,
        # --- r3-green entries that sat outside the r4 window ---
        "stratified_sample": q.stratified_sample,
        "minhash_near_dup": q.minhash_near_dup,
        "events_windowed_stats": q.events_windowed_stats,
        "top_users_by_value": q.top_users_by_value,
        "ngram_jaccard_pairs": q.ngram_jaccard_pairs,
        "embedding_near_dup": q.embedding_near_dup,
        "simhash_signatures": q.simhash_signatures_query,
        "ann_cosine_topk": q.ann_cosine_topk,
        "ann_ivf_topk": q.ann_ivf_topk,
        "lang_id_stopword": q.lang_id_stopword,
        "doc_fingerprint": q.doc_fingerprint,
        # multimodal: real container parsers cross-checked against the
        # metadata columns by the oracle
        "media_inventory": q.media_inventory,
        # --- r4's one red row (hash nondeterminism), now ordered on
        # both sides + write-once fixture ---
        "encoded_table_null_count": q.encoded_table_null_count,
        # --- new in r5: plain-SQL text routed through the pruned
        # storage kernels (equality/range/IN extractor over Spark's
        # own parse tree, decoded-view fallback) ---
        "encoded_table_sql_pushdown": q.encoded_table_sql_pushdown,
        # --- new in r5: SQL-text GROUP BY routed to the dict-code
        # bincount kernel (no per-row strings ever materialize) ---
        "encoded_table_sql_group": q.encoded_table_sql_group,
        # --- new in r5: WHERE composed under the GROUP BY kernel —
        # manifest chunk-prune + compressed-domain row masks feed the
        # bincount, all from plain SQL text ---
        "encoded_table_sql_where_group": q.encoded_table_sql_where_group,
        # --- new in r5: SELECT DISTINCT answered from the dictionary
        # heaps (code vectors never decoded on a delete-free store) ---
        "encoded_table_sql_distinct": q.encoded_table_sql_distinct,
        # --- new in r5: aggregate pushed below a dimension join, from
        # SQL text (per-key group-kernel partials join the broadcast
        # dim; the join input is the key domain, not N rows) ---
        "encoded_table_sql_join": q.encoded_table_sql_join,
        # --- changed in r5 (now entering via SQL text): need a fresh
        # driver row for the new code path ---
        "encoded_table_filter_select": q.encoded_table_filter_select,
        "encoded_table_range_select": q.encoded_table_range_select,
        # --- rotated INTO the window for r6 (r5 verdict #3): their
        # shared read path was rewritten in r5 (distributed delete
        # masks) and r6 touched delete_pushdown (kernel overlap) — the
        # oracle has never seen the rewritten kernels for these four.
        # Rule adopted: any query whose kernel changed this round
        # enters the next window. ---
        "encoded_table_delete_count": q.encoded_table_delete_count,
        "encoded_table_delete_pushdown": q.encoded_table_delete_pushdown,
        "encoded_table_upsert_count": q.encoded_table_upsert_count,
        "store_membership_antijoin": q.store_membership_antijoin,
        # --- new in r5: the last unimplemented reference row, the
        # variable-length SectionWriter (src/section.rs:83-180), driven
        # end-to-end: NibblePacked histogram rows through SectionHeader
        # sections with 64KB/256-element rollover, decoded back ---
        "var_section_histogram": q.var_section_histogram,
        # --- core reference-parity rows (src/filter.rs, sink.rs,
        # nibblepacking.rs, section.rs) ---
        "filter_equals_count": q.count_hits_equals,
        "filter_in_count": q.count_hits_one_of,
        "multi_vector_and_count": q.multi_vector_and_count,
        "range_filter_count": q.range_filter_count,
        "prefix_filter_count": q.prefix_filter_count,
        "match_positions": q.match_positions_query,
        "add_const_sum": q.add_const_sum,
        "delta_cumsum": q.delta_cumsum_query,
        "minmax_stats": q.minmax_stats,
        "codec_histogram": q.codec_histogram,
        "xor_f64_sum": q.xor_f64_sum,
        "histogram_2d_delta": q.histogram_2d_delta,
        # north-rule codecs
        "dict_filter_count": q.dict_filter_count,
        "rle_run_count": q.rle_run_count,
        "fsst_text_roundtrip": q.fsst_text_roundtrip,
        "rle_range_count": q.rle_range_count,
        "analytics_over_encoded": q.analytics_over_encoded,
        # training-data pipeline operators
        "exact_dedup": q.exact_dedup,
        "token_count_per_doc": q.token_count_per_doc,
        "quality_score": q.quality_score,
        "corpus_clean_pipeline": q.corpus_clean_pipeline,
        "token_budget_shards": q.token_budget_shards,
        # --- storage-engine rows, all green in r4; rotated behind the
        # 50-entry window (still mirror-gated in tests) ---
        "encoded_table_pruned_count": q.encoded_table_pruned_count,
        "encoded_table_range_count": q.encoded_table_range_count,
        "encoded_table_cluster_layout": q.encoded_table_cluster_layout,
        "encoded_table_multi_and_count": q.encoded_table_multi_and_count,
        "encoded_table_string_filter_count": q.encoded_table_string_filter_count,
        "encoded_table_string_range_count":
            q.encoded_table_string_range_count,
        # exact-text point lookup: per-chunk Bloom filters prune where
        # zone maps can't (unsorted probe column)
        "encoded_table_point_lookup": q.encoded_table_point_lookup,
        # snapshot (time-travel) reads off the append_log's reserved
        # part ranges: as-of a batch, and a single batch's diff
        "snapshot_as_of_count": q.snapshot_as_of_count,
        "snapshot_diff_count": q.snapshot_diff_count,
        # time travel composed with pushdown: pruned range count AS OF
        # a batch (part cutoff on manifest + chunks scan)
        "snapshot_pruned_range_count": q.snapshot_pruned_range_count,
        # schema evolution: batch-added column, NULL back-fill on
        # pre-evolution parts, no existing chunk rewritten
        "schema_evolution_nulls": q.schema_evolution_nulls,
        # row-level DELETE materialization rewrite (delete_count /
        # delete_pushdown / upsert rotated into the front window above)
        "encoded_table_delete_materialize":
            q.encoded_table_delete_materialize,
        # IN-list over the store: OneOf on compressed codes, blooms
        # pruning chunks where every listed value is provably absent
        "encoded_table_string_in_count": q.encoded_table_string_in_count,
        "encoded_table_float_range_count":
            q.encoded_table_float_range_count,
        "encoded_table_sum_pushdown": q.encoded_table_sum_pushdown,
        "encoded_table_group_count": q.encoded_table_group_count,
        "encoded_table_dim_join_count": q.encoded_table_dim_join_count,
        "encoded_table_distinct_pushdown": q.encoded_table_distinct_pushdown,
        "encoded_table_group_sum": q.encoded_table_group_sum,
        "encoded_table_topk_pushdown": q.encoded_table_topk_pushdown,
        "encoded_table_minmax_pushdown": q.encoded_table_minmax_pushdown,
    }


_BITS = "(CASE WHEN {x} = 0 THEN 0 ELSE CAST(floor(log2({x})) AS BIGINT) + 1 END)"


def _nibbles(x: str) -> str:
    return f"(({_BITS.format(x=x)} + 3) // 4)"


def oracle_sql() -> dict[str, str]:
    return {
        "filter_equals_count":
            "SELECT count(*) AS hits FROM lineitem WHERE l_linenumber = 3",
        "filter_in_count":
            "SELECT count(*) AS hits FROM lineitem "
            "WHERE CAST(l_quantity AS BIGINT) IN (1, 5, 9)",
        "multi_vector_and_count":
            "SELECT count(*) AS hits FROM lineitem "
            "WHERE CAST(l_quantity AS BIGINT) = 5 AND l_linenumber = 3",
        "range_filter_count":
            "SELECT count(*) AS hits FROM lineitem "
            "WHERE l_partkey BETWEEN 100 AND 500 "
            "AND l_returnflag BETWEEN 'A' AND 'N'",
        "prefix_filter_count":
            "SELECT count(*) AS hits FROM documents WHERE source LIKE 'src1%'",
        "encoded_table_pruned_count":
            "SELECT count(*) AS hits FROM orders WHERE o_orderkey = 1",
        "encoded_table_range_count":
            "SELECT count(*) AS hits FROM orders "
            "WHERE o_orderkey BETWEEN 1000 AND 5000",
        "encoded_table_cluster_layout":
            "SELECT count(*) AS hits FROM orders "
            "WHERE o_custkey BETWEEN 100 AND 160",
        "encoded_table_multi_and_count":
            "SELECT count(*) AS hits FROM orders "
            "WHERE o_orderkey BETWEEN 1000 AND 20000 AND o_custkey = 605",
        "encoded_table_string_filter_count":
            "SELECT CAST(count(CASE WHEN source = 'src12' THEN 1 END) AS BIGINT)"
            " AS eq_hits, "
            "CAST(count(CASE WHEN source LIKE 'src1%' THEN 1 END) AS BIGINT)"
            " AS prefix_hits FROM documents",
        "encoded_table_string_range_count":
            "SELECT CAST(count(CASE WHEN source BETWEEN 'src12' AND 'src17'"
            " THEN 1 END) AS BIGINT) AS range_hits FROM documents",
        "encoded_table_point_lookup":
            "SELECT CAST(count(*) AS BIGINT) AS hits FROM documents "
            "WHERE text = (SELECT text FROM documents WHERE doc_id = 42)",
        "store_membership_antijoin":
            "WITH probes AS ("
            "  SELECT doc_id AS probe_id, text FROM documents"
            "  WHERE doc_id % 10 = 3"
            "  UNION ALL"
            "  SELECT doc_id + 10000000 AS probe_id, text || '#NEW#' AS text"
            "  FROM documents WHERE doc_id % 10 = 4)"
            " SELECT CAST(p.probe_id AS BIGINT) AS probe_id FROM probes p"
            " WHERE NOT EXISTS ("
            "   SELECT 1 FROM documents d WHERE d.text = p.text)",
        "snapshot_as_of_count":
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents WHERE doc_id % 4 <= 2",
        "snapshot_diff_count":
            "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents WHERE doc_id % 4 = 3",
        "snapshot_pruned_range_count":
            "SELECT CAST(count(CASE WHEN n_chars BETWEEN 100 AND 400 "
            "THEN 1 END) AS BIGINT) AS hits "
            "FROM documents WHERE doc_id % 4 <= 2",
        "schema_evolution_nulls":
            "SELECT CAST(count(*) AS BIGINT) AS total, "
            "CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)"
            " AS with_source, "
            "CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END)"
            " AS BIGINT) AS sum_chars_new "
            "FROM documents",
        # live view after DELETE WHERE lang='en' and the overlapping
        # DELETE WHERE n_chars BETWEEN 0 AND 150 (null-safe: a NULL
        # predicate never deletes, matching SQL DELETE semantics)
        "encoded_table_delete_count":
            "SELECT CAST(count(*) AS BIGINT) AS live_rows, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents "
            "WHERE NOT COALESCE(lang = 'en', FALSE) "
            "AND NOT COALESCE(n_chars BETWEEN 0 AND 150, FALSE)",
        "encoded_table_delete_materialize":
            "SELECT CAST(count(*) AS BIGINT) AS live_rows, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents "
            "WHERE NOT COALESCE(lang = 'en', FALSE) "
            "AND NOT COALESCE(n_chars BETWEEN 0 AND 150, FALSE)",
        # pruned reads over the live (post-delete) view: equality,
        # range, filtered sum and top-k recomputed by the oracle from
        # the same two delete predicates
        "encoded_table_delete_pushdown":
            "WITH live AS (SELECT * FROM documents "
            "  WHERE NOT COALESCE(lang = 'en', FALSE) "
            "  AND NOT COALESCE(n_chars BETWEEN 0 AND 150, FALSE)) "
            "SELECT "
            "(SELECT CAST(count(*) AS BIGINT) FROM live "
            "  WHERE lang = 'de') AS cnt_lang_de, "
            "(SELECT CAST(count(*) AS BIGINT) FROM live "
            "  WHERE n_chars BETWEEN 200 AND 400) AS cnt_range, "
            "(SELECT CAST(COALESCE(sum(doc_id), 0) AS BIGINT) FROM live "
            "  WHERE n_chars BETWEEN 200 AND 400) AS sum_ids, "
            "(SELECT CAST(COALESCE(sum(v), 0) AS BIGINT) FROM ("
            "  SELECT n_chars AS v FROM live "
            "  ORDER BY n_chars DESC LIMIT 5) t) AS top5_sum",
        # MERGE by key: doc_id%7=3 rows replaced (n_chars+1000000),
        # doc_id%10=4 rows inserted under new keys (n_chars+5)
        "encoded_table_upsert_count":
            "SELECT CAST(count(*) AS BIGINT) AS live_rows, "
            "CAST(sum(ch) AS BIGINT) AS sum_chars FROM ("
            "  SELECT CASE WHEN doc_id % 7 = 3 THEN n_chars + 1000000"
            "         ELSE n_chars END AS ch FROM documents"
            "  UNION ALL"
            "  SELECT n_chars + 5 AS ch FROM documents"
            "  WHERE doc_id % 10 = 4)",
        "encoded_table_string_in_count":
            "SELECT CAST(count(*) AS BIGINT) AS hits FROM documents"
            " WHERE text IN ("
            "   SELECT text FROM documents WHERE doc_id IN (7, 101)"
            "   UNION ALL"
            "   SELECT text || '#ABSENT#' FROM documents WHERE doc_id = 7)",
        "encoded_table_float_range_count":
            "SELECT CAST(count(CASE WHEN value BETWEEN 10.0 AND 20.0"
            " THEN 1 END) AS BIGINT) AS range_hits FROM events",
        "encoded_table_filter_select":
            "SELECT doc_id, n_chars FROM documents WHERE source = 'src12'",
        "encoded_table_range_select":
            "SELECT o_orderkey, o_custkey FROM orders "
            "WHERE o_orderkey BETWEEN 1000 AND 3000",
        "encoded_table_sum_pushdown":
            "SELECT CAST(sum(o_custkey) AS BIGINT) AS sum_custkey "
            "FROM orders WHERE o_orderkey BETWEEN 1000 AND 20000",
        "encoded_table_group_count":
            "SELECT source, count(*) AS doc_count FROM documents "
            "WHERE source IS NOT NULL GROUP BY source",
        "encoded_table_dim_join_count":
            "WITH dim AS (SELECT printf('src%02d', i) AS source, "
            "CASE WHEN i % 2 = 0 THEN 'even' ELSE 'odd' END AS tier "
            "FROM range(100) t(i)) "
            "SELECT tier, CAST(count(*) AS BIGINT) AS docs "
            "FROM documents JOIN dim USING(source) "
            "GROUP BY tier ORDER BY tier",
        "encoded_table_distinct_pushdown":
            "SELECT CAST(count(DISTINCT source) AS BIGINT) "
            "AS distinct_sources FROM documents",
        "encoded_table_group_sum":
            "SELECT source, CAST(sum(n_chars) AS BIGINT) AS sum_chars "
            "FROM documents WHERE source IS NOT NULL GROUP BY source",
        "encoded_table_topk_pushdown":
            "SELECT CAST(o_custkey AS BIGINT) AS v FROM orders "
            "ORDER BY v DESC LIMIT 10",
        "rle_range_count":
            "SELECT count(*) AS hits FROM orders "
            "WHERE o_custkey BETWEEN 100 AND 700",
        "encoded_table_minmax_pushdown":
            "SELECT CAST(min(o_custkey) AS BIGINT) AS min_custkey, "
            "CAST(max(o_custkey) AS BIGINT) AS max_custkey FROM orders",
        "analytics_over_encoded":
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "count(*) AS count_order FROM lineitem "
            "GROUP BY l_returnflag, l_linestatus",
        "match_positions":
            "SELECT pos FROM ("
            "  SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS pos, o_orderstatus"
            "  FROM orders) t WHERE o_orderstatus = 'F'",
        "add_const_sum":
            "SELECT CAST(sum(l_partkey + 1000) AS BIGINT) AS sum_plus_const, "
            "count(*) AS n_rows FROM lineitem",
        "delta_cumsum":
            "SELECT l_orderkey, l_linenumber, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) OVER ("
            "  ORDER BY l_orderkey, l_linenumber "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty "
            "FROM lineitem",
        "minmax_stats":
            "SELECT CAST(min(l_suppkey) AS BIGINT) AS min_suppkey, "
            "CAST(max(l_suppkey) AS BIGINT) AS max_suppkey FROM lineitem",
        "codec_histogram":
            # re-derive the AutoEncoder decision (reference
            # src/section.rs:821-846) per 256-row block in pure SQL,
            # including the zero-padding of the final partial block
            "WITH ordered AS ("
            "  SELECT l_partkey AS v, "
            "         row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS rn"
            "  FROM lineitem), "
            "blocks AS ("
            "  SELECT rn // 256 AS blk, "
            "         CASE WHEN count(*) < 256 THEN least(min(v), 0) ELSE min(v) END AS mn, "
            "         CASE WHEN count(*) < 256 THEN greatest(max(v), 0) ELSE max(v) END AS mx "
            "  FROM ordered GROUP BY rn // 256), "
            "coded AS ("
            "  SELECT CASE WHEN mn = mx AND mn = 0 THEN 'Null' "
            "              WHEN mn = mx THEN 'Constant' "
            f"             WHEN {_nibbles('(mx - mn)')} < {_nibbles('mx')} THEN 'DeltaNPMedium' "
            "              ELSE 'NibblePackedMedium' END AS codec "
            "  FROM blocks) "
            "SELECT codec, count(*) AS sections FROM coded GROUP BY codec",
        "xor_f64_sum":
            "SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            " AS total_price_cents, count(*) AS n_rows, true AS bit_exact FROM lineitem",
        "histogram_2d_delta":
            "SELECT CAST(least(l_linenumber, 8) AS INT) AS bucket, "
            "count(*) AS total FROM lineitem GROUP BY 1",
        # same bucket totals; the engine side must survive the
        # SectionWriter pack/rollover/decode round-trip to match
        "var_section_histogram":
            "SELECT CAST(least(l_linenumber, 8) AS INT) AS bucket, "
            "count(*) AS total FROM lineitem GROUP BY 1",
        "dict_filter_count":
            "SELECT count(*) AS hits FROM documents WHERE lang = 'en'",
        "rle_run_count":
            "SELECT CAST(1 + coalesce(sum(CASE WHEN chg THEN 1 ELSE 0 END), 0) AS BIGINT)"
            " AS n_runs FROM ("
            "  SELECT o_custkey <> lag(o_custkey) OVER (ORDER BY o_orderkey) AS chg"
            "  FROM orders) t",
        "fsst_text_roundtrip":
            "SELECT CAST(sum(length(text)) AS BIGINT) AS total_chars, "
            "count(*) AS n_docs FROM documents",
        "exact_dedup":
            "SELECT count(*) AS n_unique, CAST(sum(c - 1) AS BIGINT) AS n_dups FROM ("
            "  SELECT md5(text) AS h, count(*) AS c FROM documents GROUP BY md5(text)) t",
        "token_count_per_doc":
            "SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
            " AS BIGINT) AS n_tokens FROM documents",
        "quality_score":
            "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, "
            "CAST(floor((length(text) - length(replace(text, ' ', ''))) * 1000000.0 "
            "/ greatest(length(text), 1)) AS BIGINT) AS space_ratio_ppm FROM documents",
        "token_budget_shards":
            "SELECT doc_id, n_tokens, "
            "CAST(floor((run_tokens - n_tokens) / 4096.0) AS BIGINT) AS shard_id "
            "FROM ("
            "  SELECT doc_id, n_tokens, "
            "    sum(n_tokens) OVER (ORDER BY doc_id "
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_tokens"
            "  FROM ("
            "    SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "      ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
            "      AS BIGINT) AS n_tokens FROM documents) t) w",
        "stratified_sample":
            "SELECT doc_id, lang FROM documents "
            "WHERE substr(md5(text), 1, 1) < (CASE WHEN lang = 'en' "
            "THEN '8' ELSE '4' END)",
        "corpus_clean_pipeline":
            "WITH scored AS ("
            "  SELECT doc_id, lang, text, "
            "    CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "         ELSE length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 END"
            "         AS BIGINT) AS n_tokens, "
            "    CAST(floor((length(text) - length(replace(text, ' ', ''))) * 1000000.0 "
            "         / greatest(length(text), 1)) AS BIGINT) AS space_ppm"
            "  FROM documents), "
            "filtered AS ("
            "  SELECT * FROM scored WHERE lang = 'en' AND n_tokens >= 40 "
            "  AND space_ppm BETWEEN 150000 AND 200000) "
            "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, "
            "CAST(min(n_tokens) AS BIGINT) AS n_tokens "
            "FROM filtered GROUP BY md5(text)",
        "minhash_near_dup":
            # exact all-pairs 5-shingle Jaccard in SQL; the engine's
            # MinHash-LSH (128 hashes, 64 bands x 2 rows) has recall
            # ~1-1e-19 at the 0.7 threshold, so verified candidates ==
            # the exact answer
            "WITH pos AS ("
            "  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i"
            "  FROM documents WHERE length(text) >= 5), "
            "sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS s FROM pos), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY 1, 2) "
            "SELECT d1, d2 FROM inter "
            "JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id "
            "WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.7",
        "near_dup_clusters":
            # exact pair set (same derivation as minhash_near_dup's
            # oracle) -> transitive closure via a recursive min-label
            # CTE: reach(node, r) enumerates every (node, reachable id)
            # pair; min(r) per node is the component representative
            "WITH RECURSIVE pos AS ("
            "  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i"
            "  FROM documents WHERE length(text) >= 5), "
            "sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS s FROM pos), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY 1, 2), "
            "pairs AS ("
            "  SELECT d1, d2 FROM inter "
            "  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id "
            "  WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.7), "
            "edges AS ("
            "  SELECT d1 AS u, d2 AS v FROM pairs "
            "  UNION SELECT d2, d1 FROM pairs), "
            "reach(node, r) AS ("
            "  SELECT u, u FROM edges "
            "  UNION "
            "  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node), "
            "labels AS (SELECT node, min(r) AS rep FROM reach GROUP BY node) "
            "SELECT CAST(node AS BIGINT) AS doc_id, "
            "CAST(rep AS BIGINT) AS cluster_rep, "
            "CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS cluster_size "
            "FROM labels",
        "dedup_keep_best":
            # same closure as near_dup_clusters, then keep the longest
            # doc per cluster (ties: lowest doc_id)
            "WITH RECURSIVE pos AS ("
            "  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i"
            "  FROM documents WHERE length(text) >= 5), "
            "sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS s FROM pos), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY 1, 2), "
            "pairs AS ("
            "  SELECT d1, d2 FROM inter "
            "  JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id "
            "  WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.7), "
            "edges AS ("
            "  SELECT d1 AS u, d2 AS v FROM pairs "
            "  UNION SELECT d2, d1 FROM pairs), "
            "reach(node, r) AS ("
            "  SELECT u, u FROM edges "
            "  UNION "
            "  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node), "
            "labels AS (SELECT node, min(r) AS rep FROM reach GROUP BY node), "
            "ranked AS ("
            "  SELECT l.node, l.rep, "
            "  row_number() OVER (PARTITION BY l.rep "
            "                     ORDER BY d.n_chars DESC, l.node ASC) AS rn, "
            "  count(*) OVER (PARTITION BY l.rep) AS sz "
            "  FROM labels l JOIN documents d ON d.doc_id = l.node) "
            "SELECT CAST(rep AS BIGINT) AS cluster_rep, "
            "CAST(node AS BIGINT) AS kept_doc_id, "
            "CAST(sz - 1 AS BIGINT) AS dropped "
            "FROM ranked WHERE rn = 1",
        "events_windowed_stats":
            "SELECT date_trunc('hour', ts) AS hr, event_type, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents "
            "FROM events GROUP BY 1, 2",
        "top_users_by_value":
            "SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            " AS value_cents FROM events GROUP BY user_id "
            "ORDER BY value_cents DESC, user_id LIMIT 20",
        "ngram_jaccard_pairs":
            "WITH pos AS ("
            "  SELECT doc_id, text, unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i"
            "  FROM documents WHERE length(text) >= 5), "
            "sh AS (SELECT DISTINCT doc_id, substr(text, i, 5) AS s FROM pos), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), "
            "inter AS ("
            "  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS c"
            "  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            "  GROUP BY 1, 2) "
            "SELECT d1, d2 FROM inter "
            "JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id "
            "WHERE c * 1.0 / (s1.n + s2.n - c) >= 0.5",
        "embedding_near_dup":
            # same deterministic twin augmentation as the Spark side:
            # every 50th vec_id duplicated at exactly 2x (power of two
            # => float32-exact), making the near-dup row non-vacuous
            "WITH aug AS ("
            "  SELECT vec_id, embedding FROM embeddings"
            "  UNION ALL"
            "  SELECT vec_id + 10000000, "
            "         list_transform(embedding, x -> CAST(x * 2 AS REAL))"
            "  FROM embeddings WHERE vec_id % 50 = 0) "
            "SELECT a.vec_id AS v1, b.vec_id AS v2 FROM aug a, aug b "
            "WHERE a.vec_id < b.vec_id AND floor(list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) * 1000000.0)"
            " >= 950000",
        "semantic_dedup_clusters":
            # exact cosine pair set (same as embedding_near_dup's
            # oracle) -> recursive min-label closure, as in
            # near_dup_clusters
            "WITH RECURSIVE aug AS ("
            "  SELECT vec_id, embedding FROM embeddings"
            "  UNION ALL"
            "  SELECT vec_id + 10000000, "
            "         list_transform(embedding, x -> CAST(x * 2 AS REAL))"
            "  FROM embeddings WHERE vec_id % 50 = 0), "
            "pairs AS ("
            "  SELECT a.vec_id AS v1, b.vec_id AS v2 FROM aug a, aug b "
            "  WHERE a.vec_id < b.vec_id AND floor(list_cosine_similarity("
            "  CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
            "  * 1000000.0) >= 950000), "
            "edges AS ("
            "  SELECT v1 AS u, v2 AS v FROM pairs "
            "  UNION SELECT v2, v1 FROM pairs), "
            "reach(node, r) AS ("
            "  SELECT u, u FROM edges "
            "  UNION "
            "  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node), "
            "labels AS (SELECT node, min(r) AS rep FROM reach GROUP BY node) "
            "SELECT CAST(node AS BIGINT) AS vec_id, "
            "CAST(rep AS BIGINT) AS cluster_rep, "
            "CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS cluster_size "
            "FROM labels",
        "ann_cosine_topk":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id FROM embeddings, q WHERE vec_id <> 0 "
            "ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id LIMIT 10",
        "ann_ivf_topk":
            "WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id FROM embeddings, q WHERE vec_id <> 0 "
            "ORDER BY list_cosine_similarity(embedding, qe) DESC, vec_id LIMIT 10",
        "lang_id_stopword":
            "SELECT doc_id, CAST(floor(len(list_filter(string_split(trim(text), ' '), "
            "x -> x IN ('the','of','and','to','in','a','is','that','for','it','with',"
            "'as','on','be','at','by','this','from'))) * 1000000.0 "
            "/ greatest(len(string_split(trim(text), ' ')), 1)) AS BIGINT) "
            "AS stopword_ppm FROM documents",
        "simhash_signatures":
            # full SimHash re-derivation in SQL: same 4-byte windowed
            # polynomial feature hash mod 2^31, +/-1 votes per bit over
            # every window occurrence, sign of the vote sets the bit
            "WITH pos AS ("
            "  SELECT doc_id, text, "
            "         unnest(range(1, greatest(length(text) - 3, 0) + 1)) AS i"
            "  FROM documents WHERE length(text) >= 4), "
            "feat AS ("
            "  SELECT doc_id, "
            "    (CAST(ascii(substr(text, i, 1)) AS BIGINT) * 2654435761 "
            "     + CAST(ascii(substr(text, i + 1, 1)) AS BIGINT) * 2246822519 "
            "     + CAST(ascii(substr(text, i + 2, 1)) AS BIGINT) * 3266489917 "
            "     + CAST(ascii(substr(text, i + 3, 1)) AS BIGINT) * 668265263) "
            "    % 2147483648 AS h"
            "  FROM pos), "
            "votes AS ("
            "  SELECT doc_id, bit, "
            "         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v"
            "  FROM feat CROSS JOIN (SELECT unnest(range(0, 31)) AS bit) b"
            "  GROUP BY doc_id, bit), "
            "sig AS ("
            "  SELECT doc_id, sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)"
            "                          ELSE 0 END) AS simhash"
            "  FROM votes GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash "
            "FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id",
        "doc_fingerprint":
            "WITH pos AS (SELECT doc_id, text, "
            "unnest(range(1, length(text) + 1)) AS i FROM documents) "
            "SELECT doc_id, CAST(sum(ascii(substr(text, i, 1)) * "
            "(CASE (i - 1) % 8 WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 "
            "WHEN 3 THEN 29791 WHEN 4 THEN 923521 WHEN 5 THEN 28629151 "
            "WHEN 6 THEN 887503681 ELSE 27512614111 END)) "
            f"% {1 << 31} AS BIGINT) AS fingerprint "
            "FROM pos GROUP BY doc_id",
        # the Spark side PARSES every payload (P6 PPM / RIFF WAVE); the
        # oracle re-derives counts from metadata + raw blob functions
        # over the same deterministic parquet (written by the query)
        "media_inventory": q.media_inventory_oracle(),
        "url_canonical_dedup": q.url_canonical_dedup_oracle(),
        "pii_scrub": q.pii_scrub_oracle(),
        "boilerplate_removal": q.boilerplate_removal_oracle(),
        "decontaminate_ngram_overlap": q.decontaminate_ngram_overlap_oracle(),
        "c4_line_filter": q.c4_line_filter_oracle(),
        "gopher_quality_flags": q.gopher_quality_flags_oracle(),
        "events_asof_join": q.events_asof_join_oracle(),
        "duplicate_span_removal": q.duplicate_span_removal_oracle(),
        "encoded_table_null_count": q.encoded_table_null_count_oracle(),
        "encoded_table_sql_pushdown": q.encoded_table_sql_pushdown_oracle(),
        "encoded_table_sql_group": q.encoded_table_sql_group_oracle(),
        "encoded_table_sql_where_group":
            q.encoded_table_sql_where_group_oracle(),
        "encoded_table_sql_distinct":
            q.encoded_table_sql_distinct_oracle(),
        "encoded_table_sql_join": q.encoded_table_sql_join_oracle(),
        "repetition_ratio":
            "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct, "
            "CAST((count(*) - count(DISTINCT tok)) * 1000000 "
            "// count(*) AS BIGINT) AS dup_ppm "
            "FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
            "      FROM documents WHERE text IS NOT NULL) "
            "GROUP BY doc_id",
    }
