"""Driver-facing query registry: the ≤50 entries the driver's
correctness gate actually records.

Round-1 evidence: the driver writes CORRECTNESS rows for exactly the
FIRST 50 entries of ``queries()`` — with 87 fine-grained queries, 37
operators were invisible to the gate every round. This module folds the
fine-grained surface (registry.all_queries — still fully oracle-checked
by scripts/parity_check.py and tests) into ≤50 driver entries:

- High-value queries (TPC-H, MVCC, flagship pipeline ops) stay 1:1 with
  full row/schema/hash fidelity.
- Families of related operators merge into one *digest* query: each
  member's full result is aggregated to one labeled row
  (q, n_rows, d1..dN) where every dN is an aggregate over the member's
  output columns written ONCE as SQL that both Spark SQL and DuckDB
  evaluate — the Spark side applies it to the member DataFrame via
  selectExpr, the oracle side wraps the member's oracle SQL. A value
  drift in any member column shifts its digest row, so the driver still
  verifies every operator every round, at one row per member.

Full-fidelity per-operator comparison is NOT lost: parity_check runs the
fine registry (87 queries, row-level hash) in the same sweep.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tiflash_spark import registry as fine

QueryFn = Callable[[SparkSession, str], DataFrame]

# (group name) -> list of (member fine-query name, [digest agg SQL exprs]).
# Exprs must be portable Spark-SQL/DuckDB aggregate expressions over the
# member's OUTPUT columns. ROUND(...,2/4) on double sums kills ulp noise.
DIGEST_GROUPS: dict[str, list[tuple[str, list[str]]]] = {
    "scan_filter_topn": [
        ("q2_topn", ["SUM(o_orderkey)", "ROUND(SUM(o_totalprice), 2)"]),
        ("q3_filter_project",
         ["SUM(l_orderkey + l_linenumber + qty_int)", "ROUND(SUM(net_price), 2)"]),
    ],
    "relational_core": [
        ("agg_functions",
         ["SUM(cnt + cnt_col + ndv_supp + first_part)",
          "ROUND(SUM(sum_qty + avg_price + min_max_mix), 2)",
          "SUM(YEAR(min_ship) + YEAR(max_ship))"]),
        ("agg_functions_extended",
         ["ROUND(SUM(var_p + var_s + std_p + std_s), 2)",
          "SUM(band + bor + bxor)", "ROUND(SUM(median_qty + p90_qty), 2)"]),
        ("group_concat",
         ["SUM(LENGTH(nations) + LENGTH(initials))", "SUM(LENGTH(r_name))"]),
        ("group_concat_ordered",
         ["SUM(n_regionkey)", "SUM(LENGTH(nations_by_wealth))",
          "ROUND(SUM(region_bal), 2)"]),
        ("distinct", ["SUM(LENGTH(l_returnflag) + LENGTH(l_linestatus))"]),
        ("set_operations", ["SUM(o_custkey)"]),
        ("having_subquery",
         ["SUM(num_rich)", "ROUND(SUM(total_bal), 2)", "SUM(LENGTH(c_mktsegment))"]),
        ("cte_reuse", ["SUM(n)", "SUM(LENGTH(bucket))"]),
    ],
    "join_outer": [
        ("join_left_outer", ["SUM(n_big_orders + n_customers)"]),
        ("join_right_outer", ["SUM(c_nationkey)", "SUM(n_orders + n_rows)"]),
        ("join_full_outer", ["SUM(nationkey)", "SUM(n_cust + n_supp)"]),
    ],
    "join_semi_anti": [
        ("join_semi", ["SUM(n)", "SUM(LENGTH(c_mktsegment))"]),
        ("join_anti", ["SUM(n_idle)"]),
        ("join_right_semi", ["SUM(n)", "ROUND(SUM(total), 2)"]),
        ("join_right_anti", ["SUM(n)"]),
        ("join_null_aware_anti", ["SUM(n)"]),
        ("join_runtime_filter",
         ["SUM(n_lines)", "ROUND(SUM(sum_qty + revenue), 2)",
          "SUM(LENGTH(p_type))"]),
    ],
    "join_flags_cross": [
        ("join_left_outer_semi",
         ["SUM(n)", "SUM(CASE WHEN has_urgent THEN n ELSE 0 END)"]),
        ("join_left_outer_anti",
         ["SUM(n)", "SUM(CASE WHEN no_urgent THEN n ELSE 0 END)"]),
        ("join_na_left_outer_semi",
         ["SUM(n)", "SUM(CASE WHEN in_flag THEN n ELSE 0 END)",
          "SUM(CASE WHEN in_flag IS NULL THEN n ELSE 0 END)"]),
        ("join_na_left_outer_anti",
         ["SUM(n)", "SUM(CASE WHEN not_in_flag THEN n ELSE 0 END)",
          "SUM(CASE WHEN not_in_flag IS NULL THEN n ELSE 0 END)"]),
        ("join_cross", ["SUM(n_foreign)", "SUM(LENGTH(r_name))"]),
        ("join_cross_semi", ["SUM(n)", "ROUND(SUM(total), 2)"]),
        ("join_cross_anti", ["SUM(n)", "ROUND(SUM(max_price), 2)"]),
        ("join_cross_left_outer",
         ["SUM(n_higher)", "SUM(CASE WHEN has_higher THEN 1 ELSE 0 END)",
          "SUM(LENGTH(n_name))"]),
    ],
    "window_functions": [
        ("window_ranking",
         ["SUM(rnk + drnk + rn)",
          "SUM(COALESCE(next_order, 0) + COALESCE(prev_order, 0)"
          " + top_order + bottom_order)",
          "SUM(o_orderkey)"]),
        ("window_rows_frame",
         ["ROUND(SUM(mov_sum + mov_min + mov_max), 2)",
          "ROUND(SUM(mov_avg), 2)", "SUM(mov_cnt + seq)"]),
        ("window_range_frame", ["SUM(n_near)", "ROUND(SUM(near_total), 2)"]),
        ("window_unbounded",
         ["ROUND(SUM(running_bal), 2)", "ROUND(SUM(pct_of_total), 4)"]),
        ("window_extended",
         ["SUM(quartile + COALESCE(second_order, 0))",
          "ROUND(SUM(pct_rank + cdist), 4)"]),
        ("events_time_range_window",
         ["SUM(user_id + n_events + max_trail_n)",
          "ROUND(SUM(sum_trail_v), 2)"]),
    ],
    "grouping_expand": [
        ("rollup_revenue", ["SUM(n + g_flag + g_status)", "ROUND(SUM(sum_qty), 2)"]),
        ("cube_orders", ["SUM(n + g_status + g_prio)", "ROUND(SUM(avg_price), 2)"]),
        ("grouping_sets", ["SUM(n + g1 + g2)", "ROUND(SUM(sum_price), 2)"]),
    ],
    "scalar_string": [
        ("string_functions",
         # `asc` (ASCII value col) is a reserved word in DuckDB — left out
         # here; the fine query's row-level check still covers it
         ["SUM(len + clen + pos_a)",
          "SUM(LENGTH(cat) + LENGTH(cat_ws) + LENGTH(lo) + LENGTH(up)"
          " + LENGTH(tr) + LENGTH(ltr) + LENGTH(rtr) + LENGTH(lpadded)"
          " + LENGTH(rpadded) + LENGTH(sub) + LENGTH(subidx) + LENGTH(left3)"
          " + LENGTH(right3) + LENGTH(hx) + LENGTH(rep) + LENGTH(rev)"
          " + LENGTH(repl))",
          "SUM(p_partkey)"]),
        ("regexp_functions",
         ["SUM(CAST(like_a AS INT) + CAST(ilike_a AS INT)"
          " + CAST(rx_start AS INT) + CAST(brand_ok AS INT))",
          "SUM(n_a + digit_pos)",
          "SUM(LENGTH(first_word) + LENGTH(devoweled) + LENGTH(head_token))"]),
        ("misc_functions",
         ["SUM(CAST(ip_ok AS INT))", "SUM(ip_roundtrip + dur_s)",
          "SUM(LENGTH(ip) + LENGTH(dur_str) + LENGTH(bits))"]),
    ],
    "scalar_numeric": [
        ("math_functions",
         ["ROUND(SUM(abs_d + round_1 + sqrt_x + ln_x + log2_x + log10_x"
          " + sin_t + cos_t + atan_t + rad_q + deg_t), 2)",
          "SUM(ceil_x + floor_x + sign_d + mod7)",
          "ROUND(SUM(qty_sq), 2)"]),
        ("cast_functions",
         ["SUM(qty_i + COALESCE(bad_parse, 0))",
          "ROUND(SUM(price_dec + ln_d + str_num), 2)",
          "SUM(YEAR(ship_d) + YEAR(str_date) + LENGTH(qty_s) + LENGTH(ship_s))"]),
        ("control_flow",
         ["SUM(is_f + CAST(is_rush AS INT) + CAST(mid_band AS INT)"
          " + CAST(like_urgent AS INT) + CAST(nse_p AS INT))",
          "ROUND(SUM(floor100k + cap400k), 2)",
          "SUM(LENGTH(bucket) + LENGTH(status_or_open))"]),
        ("scalar_stragglers",
         ["SUM(td + tsec % 100000 + micro + dur_hm)",
          "SUM(YEAR(fd_ts) + xor_f + is_t + COALESCE(is_f_n, 7))",
          "ROUND(SUM(trunc1 + trunc_neg2), 2)",
          "SUM(CAST(shl62 AS DECIMAL(20,0)) % 97"
          " + CAST(shr3_neg AS DECIMAL(20,0)) % 97)",
          "SUM(LENGTH(COALESCE(fmt, 'x')))"]),
        ("datetime_functions",
         ["SUM(yr + qtr + mon + dom + dow + doy + woy + days_to_98)",
          "SUM(YEAR(plus30) + YEAR(minus7) + YEAR(eom) + YEAR(month_start)"
          " + YEAR(roundtrip_ts) + YEAR(plus2mo) + YEAR(gdate)"
          " + MONTH(plus30) + MONTH(eom) + MONTH(plus2mo) + DAY(eom))",
          "SUM(epoch_s + LENGTH(fmt_ymd) + LENGTH(fmt_dmy))"]),
    ],
    "json_surface": [
        ("json_functions",
         ["SUM(COALESCE(k_val, 0) + arr_len)", "SUM(CAST(has_k AS INT))",
          "SUM(LENGTH(COALESCE(missing_val, '')) + LENGTH(built_json))"]),
        ("json_functions_extended",
         ["SUM(depth_nested + depth_flat + n_keys)",
          "SUM(CAST(has_k AS INT) + CAST(has_missing AS INT)"
          " + CAST(valid_props AS INT) + CAST(valid_broken AS INT)"
          " + CAST(valid_scalar AS INT)"
          " + CASE WHEN valid_null IS NULL THEN 1 ELSE 0 END)",
          "SUM(LENGTH(keys_csv) + LENGTH(obj) + LENGTH(arr) + LENGTH(unq))"]),
    ],
    "collation_surface": [
        ("collation_group", ["SUM(n)", "SUM(LENGTH(type_ci))"]),
        ("collation_unicode_ci", ["SUM(n)", "SUM(LENGTH(rep))"]),
        ("collation_aliases",
         ["SUM(n_binary + n_bin + n_ascii_bin + n_latin1_bin)",
          "SUM(n_0900_bin + n_0900_ai_ci + n_unicode_ci)"]),
    ],
    "mvcc_modes": [
        ("mvcc_snapshot",
         ["SUM(n_visible + n_handles)", "SUM(sum_a)", "ROUND(SUM(sum_b), 2)"]),
        ("mvcc_bitmap_scan",
         ["SUM(n_visible + n_handles)", "SUM(sum_a)", "ROUND(SUM(sum_b), 2)"]),
        ("mvcc_fast_scan",
         ["SUM(n_rows + n_handles)", "SUM(sum_a)"]),
    ],
    "events_agg": [
        ("events_tumbling_window",
         ["SUM(n + n_users)", "ROUND(SUM(total_value), 2)",
          "SUM(YEAR(day) * 10000 + MONTH(day) * 100 + DAY(day))"]),
        ("events_json_enrich",
         ["SUM(min_k + max_k)", "ROUND(SUM(avg_k), 4)",
          "ROUND(SUM(k_value_corr), 4)"]),
        ("events_session_window_native",
         ["SUM(n_sessions + max_events)", "ROUND(SUM(avg_events), 4)",
          "ROUND(SUM(total_value), 2)"]),
    ],
    "text_corpus": [
        ("text_analysis",
         ["SUM(n_tokens + n_unique + n_stop + n_chars_actual"
          " + CAST(len_consistent AS INT))",
          "ROUND(SUM(quality), 4)", "SUM(LENGTH(fp) + LENGTH(lang))"]),
        ("lang_distribution", ["SUM(n)", "SUM(LENGTH(lang) + LENGTH(pred))"]),
        ("vocab_topk", ["SUM(tf + df)", "SUM(LENGTH(tok))"]),
        ("doc_length_histogram",
         ["SUM(len_bucket + n_docs)", "ROUND(SUM(avg_quality), 4)"]),
        ("token_stats_bpe",
         ["SUM(n_docs + total_ws + total_bpe)", "ROUND(SUM(bpe_inflation), 4)"]),
        ("doc_chunks",
         ["SUM(doc_id + chunk_id + n_tok)",
          "SUM(LENGTH(fp) + LENGTH(source))"]),
        ("quality_model_score",
         ["SUM(doc_id + n_tokens + CAST(keep AS INT))",
          "ROUND(SUM(logit), 3)", "ROUND(SUM(score), 3)",
          "SUM(LENGTH(source))"]),
        ("quality_signals",
         ["SUM(doc_id + n_tokens + CAST(keep AS INT))",
          "ROUND(SUM(top_word_frac + dup_bigram_frac + dup_trigram_frac"
          " + mean_word_len), 4)",
          "SUM(LENGTH(source))"]),
        ("lm_perplexity",
         ["SUM(n_docs)", "ROUND(SUM(avg_nll + ppl), 3)",
          "SUM(LENGTH(source))"]),
    ],
    "tpch_correlated": [
        ("q5_local_supplier",
         ["SUM(LENGTH(n_name))", "ROUND(SUM(revenue), 2)"]),
        ("q17_small_quantity", ["ROUND(SUM(avg_yearly), 2)"]),
    ],
    "tpch_filters": [
        ("q12_shipmode",
         ["SUM(high_line_count + low_line_count)", "SUM(LENGTH(l_linestatus))"]),
        ("q14_promo_effect", ["ROUND(SUM(promo_revenue), 4)"]),
        ("q19_disjunctive", ["ROUND(SUM(revenue), 2)", "SUM(n_lines)"]),
        ("q22_global_sales",
         ["SUM(numcust)", "ROUND(SUM(totacctbal), 2)", "SUM(LENGTH(cntrycode))"]),
    ],
    "tpcds_shapes": [
        ("tpcds_q67_shape",
         ["SUM(g_id + rk + COALESCE(d_year, 0) + COALESCE(d_qoy, 0))",
          "ROUND(SUM(sumsales), 2)",
          "SUM(COALESCE(LENGTH(p_type), 0) + COALESCE(LENGTH(p_brand), 0)"
          " + COALESCE(LENGTH(s_name), 0))"]),
        # agg/sales columns sit on a 1e-4 value grid (exact-int internals,
        # see operators/tpcds.py), so digests round at 4dp — the rounding
        # boundary (0.5e-4) is OFF the grid and ulp-stable; 2dp would put
        # the boundary ON the grid and flip between engines
        ("tpcds_q27_shape",
         ["SUM(g_state + g_brand)",
          "ROUND(SUM(agg1 + agg3 + agg4), 4)",
          "ROUND(SUM(agg2), 4)",
          "SUM(COALESCE(LENGTH(p_brand), 0) + COALESCE(LENGTH(n_name), 0))"]),
        ("tpcds_q18_shape",
         ["SUM(g_id)",
          "ROUND(SUM(agg1 + agg3 + agg4), 4)",
          "ROUND(SUM(agg2 + agg5 + agg6 + agg7), 4)",
          "SUM(COALESCE(LENGTH(p_type), 0) + COALESCE(LENGTH(cn_name), 0)"
          " + COALESCE(LENGTH(c_mktsegment), 0)"
          " + COALESCE(LENGTH(o_orderpriority), 0))"]),
        ("tpcds_q5_shape",
         ["SUM(g_channel + g_id)",
          "ROUND(SUM(sales + returns + profit), 4)",
          "SUM(COALESCE(LENGTH(channel), 0) + COALESCE(LENGTH(id), 0))"]),
    ],
    "temporal_join": [
        ("asof_join_events",
         ["SUM(event_id + user_id)",
          "SUM(COALESCE(gap_s, 0) + CASE WHEN ref_ts IS NULL THEN 1 ELSE 0 END)",
          "ROUND(SUM(COALESCE(ref_value, 0)), 2)"]),
        ("range_join_incidents",
         ["SUM(inc_id + n_events)", "ROUND(SUM(total_value), 2)"]),
        ("events_resample",
         ["SUM(n_events + CAST(is_gap AS INT))",
          "ROUND(SUM(COALESCE(avg_value_ffill, 0)), 2)",
          "SUM(YEAR(h) + MONTH(h) + DAY(h) + HOUR(h))"]),
    ],
    "fulltext_surface": [
        ("fulltext_search",
         ["SUM(doc_id + n_terms + phrase_hits)", "SUM(total_tf)"]),
        ("fulltext_bm25",
         ["SUM(doc_id + n_terms)", "ROUND(SUM(bm25), 4)"]),
        ("fulltext_boolean",
         ["SUM(doc_id + n_should)", "SUM(total_tf)"]),
    ],
    "curation": [
        ("decontaminate",
         ["SUM(n_train + n_contaminated)", "ROUND(SUM(contamination_rate), 4)",
          "SUM(LENGTH(source))"]),
        ("pii_redaction",
         ["SUM(n_docs + emails_redacted + phones_redacted)", "SUM(bytes_saved)"]),
        ("sample_stratified",
         ["SUM(n_orig + n_sampled)", "ROUND(SUM(keep_frac), 4)",
          "SUM(LENGTH(lang))"]),
        ("sample_temperature",
         ["SUM(n_orig + n_sampled)",
          "ROUND(SUM(weight + keep_frac), 4)", "SUM(LENGTH(source))"]),
        ("dedup_incremental",
         ["SUM(n_batch + n_kept + n_dropped)", "SUM(LENGTH(source))"]),
        ("curation_pipeline",
         ["SUM(n_raw + n_quality + n_unique + n_clean)",
          "SUM(n_tokens + n_chunks)", "SUM(LENGTH(source))"]),
        ("pack_sequences",
         ["SUM(chunk_id + n_docs + n_straddlers)",
          "SUM(n_tokens_started)", "SUM(LENGTH(source))"]),
        ("boilerplate_lines",
         ["SUM(n_docs + total_lines + kept_lines)",
          "ROUND(SUM(avg_drop_frac), 4)", "SUM(clean_chars)"]),
        ("dedup_exact_substring",
         ["SUM(n_docs + n_affected + n_dup_positions)",
          "SUM(n_grams + removed_tokens + kept_tokens)",
          "SUM(LENGTH(source))"]),
        ("ccnet_buckets",
         ["SUM(n_docs)", "ROUND(SUM(avg_nll), 4)",
          "SUM(LENGTH(lang) + LENGTH(bucket))"]),
        ("decontaminate_fuzzy",
         ["SUM(n_train + n_fuzzy_contaminated)",
          "ROUND(SUM(contamination_rate + avg_jaccard), 4)",
          "SUM(LENGTH(source))"]),
        ("shard_training_order",
         ["SUM(shard + n_docs + first_doc)",
          "SUM(n_tokens + order_digest)"]),
        ("mix_token_budget",
         ["SUM(docs_kept + tokens_kept + quota_tokens)",
          "ROUND(SUM(fill_ratio), 4)",
          "SUM(order_digest + LENGTH(source))"]),
        ("dataset_card",
         ["SUM(n_docs + n_unique + g_src + g_lang)",
          "SUM(n_tokens)",
          "ROUND(SUM(keep_rate), 4)",
          "SUM(COALESCE(LENGTH(source), 0) + COALESCE(LENGTH(lang), 0))"]),
    ],
    "multimodal_pipeline": [
        ("multimodal_decode",
         ["SUM(n + n_ok + max_w)", "SUM(total_bytes + hist0_sum)"]),
        ("multimodal_stages",
         ["SUM(n_media + n_frames)",
          "SUM(resized_bytes + frame_bytes + ts_ms_sum)",
          "ROUND(SUM(avg_f1), 4)"]),
        ("multimodal_ann_chain",
         ["SUM(media_id)", "ROUND(SUM(cos_sim), 4)",
          "SUM(LENGTH(media_type))"]),
        ("multimodal_phash",
         ["SUM(n_media + n_sigs + n_dup_groups + n_dup_media)",
          "SUM(n_band_sig_pairs + n_near_sig_pairs + sig_digest)"]),
    ],
    "ann_brute": [
        ("ann_cosine_topk", ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
        ("ann_l2_topk", ["SUM(vec_id)", "ROUND(SUM(l2_dist), 4)"]),
        ("dedup_embedding_cosine",
         ["SUM(vec_a + vec_b)", "ROUND(SUM(cos_sim), 4)"]),
        ("ann_quantized_topk",
         ["SUM(vec_id + label)",
          "ROUND(SUM(cos_sim_q + cos_sim_exact), 4)"]),
        ("ann_filtered_topk",
         ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
        ("hybrid_search_rrf",
         ["SUM(doc_id + COALESCE(bm25_rank, 0) + COALESCE(vec_rank, 0))",
          "ROUND(SUM(rrf), 4)"]),
        ("dedup_semantic",
         ["SUM(cluster_id + n_members)",
          "ROUND(SUM(avg_cos_centroid + COALESCE(top_cos, 0)), 4)",
          "SUM(COALESCE(top_a, 0) + COALESCE(top_b, 0))"]),
    ],
}

# Rows-only digest groups: members have no oracle (approximate/sketch
# output); the merged query still yields one deterministic row per member
# so the driver's rows-only check pins them all.
ROWS_ONLY_GROUPS: dict[str, list[tuple[str, list[str]]]] = {
    "dedup_sketches": [
        ("dedup_minhash", ["SUM(doc_a + doc_b)", "ROUND(SUM(jaccard), 4)"]),
        ("dedup_simhash", ["SUM(doc_a + doc_b)", "SUM(hamming)"]),
        ("dedup_clusters",
         ["SUM(cluster_size)", "SUM(keeper + max_member)"]),
    ],
    "ann_indexed": [
        ("ann_lsh_topk", ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
        ("ann_ivf_topk", ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
        ("dedup_embedding_lsh",
         ["SUM(vec_a + vec_b)", "ROUND(SUM(cos_sim), 4)"]),
        ("ann_ivf_filtered",
         ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
        ("ann_pq_topk",
         ["SUM(vec_id + label)", "ROUND(SUM(cos_sim + adc_score), 4)"]),
        ("ann_ivf_graph_topk",
         ["SUM(vec_id + label)", "ROUND(SUM(cos_sim), 4)"]),
    ],
    "approx_sketches": [
        ("approx_count_distinct",
         ["SUM(approx_parts + exact_parts)", "ROUND(SUM(rel_err), 4)"]),
        ("approx_quantiles", ["ROUND(SUM(p50 + p95 + lo + hi), 2)"]),
        ("approx_heavy_hitters",
         ["SUM(est + exact)", "SUM(LENGTH(tok))"]),
    ],
}

# Fine-grained queries that stay 1:1 driver entries (full fidelity),
# in gate order: previously-red rows first, then new surface, then TPC-H.
PASSTHROUGH = [
    "events_funnel",
    "q2_min_cost_supplier",
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q18_large_orders",
    "q20_potential_promotion",
    "q21_waiting_orders",
    "join_inner_broadcast",
    "join_self_agg",
    "join_salted_skew",
    "events_sessionize",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "vector_functions",
]

DRIVER_LIMIT = 50


_DIGEST_PRIMES = [3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
                  59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109]


def _prime_weight_sums(expr: str) -> str:
    """Rewrite every multi-term ``SUM(a + b + ...)`` in a digest expression
    to ``SUM((a)*3 + (b)*5 + ...)`` with unequal prime weights, so
    offsetting drifts between member columns can no longer cancel to the
    same digest value. The rewritten SQL is what BOTH engines evaluate
    (Spark selectExpr and the DuckDB oracle wrapper), so parity is
    unaffected by construction."""
    out, i = [], 0
    while True:
        j = expr.find("SUM(", i)
        if j < 0 or (j > 0 and (expr[j - 1].isalnum() or expr[j - 1] == "_")):
            if j < 0:
                out.append(expr[i:])
                return "".join(out)
            out.append(expr[i : j + 4])  # an identifier like CHECKSUM( — skip
            i = j + 4
            continue
        # find the matching close paren of this SUM(
        depth, k = 1, j + 4
        while k < len(expr) and depth:
            depth += {"(": 1, ")": -1}.get(expr[k], 0)
            k += 1
        arg = expr[j + 4 : k - 1]
        # split the argument on top-level '+' only
        terms, buf, d = [], "", 0
        for ch in arg:
            d += {"(": 1, ")": -1}.get(ch, 0)
            if ch == "+" and d == 0:
                terms.append(buf)
                buf = ""
            else:
                buf += ch
        terms.append(buf)
        if len(terms) > 1:
            if len(terms) > len(_DIGEST_PRIMES):
                raise ValueError(f"digest SUM has {len(terms)} terms; extend _DIGEST_PRIMES")
            weighted = " + ".join(
                f"({t.strip()})*{p}" for t, p in zip(terms, _DIGEST_PRIMES)
            )
            out.append(expr[i:j] + f"SUM({weighted})")
        else:
            out.append(expr[i:k])
        i = k


def _digest_select(label: str, exprs: list[str], width: int) -> list[str]:
    sel = [f"'{label}' AS q", "CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for i, e in enumerate(exprs, 1):
        sel.append(f"CAST({_prime_weight_sums(e)} AS DOUBLE) AS d{i}")
    for i in range(len(exprs) + 1, width + 1):
        sel.append(f"CAST(NULL AS DOUBLE) AS d{i}")
    return sel


def _make_digest_fn(members: list[tuple[str, list[str]]]) -> QueryFn:
    width = max(len(e) for _, e in members)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        fine_qs = fine.all_queries()
        out: DataFrame | None = None
        for label, exprs in members:
            part = fine_qs[label](spark, sf_dir).selectExpr(
                *_digest_select(label, exprs, width)
            )
            out = part if out is None else out.unionByName(part)
        return out.orderBy("q")

    return run


def _make_digest_sql(members: list[tuple[str, list[str]]]) -> str:
    width = max(len(e) for _, e in members)
    fine_sql = fine.all_oracles()
    parts = []
    for label, exprs in members:
        cols = ",\n       ".join(_digest_select(label, exprs, width))
        parts.append(f"SELECT {cols}\nFROM (\n{fine_sql[label].strip()}\n) _t")
    return "\nUNION ALL\n".join(parts) + "\nORDER BY q"


def driver_queries() -> dict[str, QueryFn]:
    fine_qs = fine.all_queries()
    out: dict[str, QueryFn] = {name: fine_qs[name] for name in PASSTHROUGH}
    for gname, members in {**DIGEST_GROUPS, **ROWS_ONLY_GROUPS}.items():
        out[gname] = _make_digest_fn(members)
    if len(out) > DRIVER_LIMIT:
        raise ValueError(
            f"driver registry has {len(out)} entries; the gate records only "
            f"the first {DRIVER_LIMIT} — merge or drop before adding more"
        )
    # sanity: every fine query must be covered exactly once
    covered = set(PASSTHROUGH)
    for members in list(DIGEST_GROUPS.values()) + list(ROWS_ONLY_GROUPS.values()):
        for label, _ in members:
            if label in covered:
                raise ValueError(f"{label} covered twice in driver registry")
            covered.add(label)
    missing = set(fine_qs) - covered
    if missing:
        raise ValueError(f"fine queries not driver-covered: {sorted(missing)}")
    return out


def driver_oracles() -> dict[str, str]:
    fine_sql = fine.all_oracles()
    out: dict[str, str] = {
        name: fine_sql[name] for name in PASSTHROUGH if name in fine_sql
    }
    for gname, members in DIGEST_GROUPS.items():
        out[gname] = _make_digest_sql(members)
    # ROWS_ONLY_GROUPS intentionally get no oracle entry
    return out
