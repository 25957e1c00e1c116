"""Spark-dialect SQL for every §2 query whose ORACLE text is
DuckDB-only — so EP2 (``Engine.sql``) covers the full declared surface
with plain SQL strings, not just the DataFrame/CALL doors.

Each statement is parity-tested against its DataFrame implementation
(tests/test_sql_library.py) with the driver's exact-match comparison:
same aliases, same decimal-grid rounding (functions.numeric), same
higher-order-function factoring for vector math (functions.vector) —
so the SQL and DataFrame doors return bit-identical frames.

Queries whose oracle already runs verbatim through Spark SQL (plain
ANSI) are deliberately absent — tests/test_sql_door_parity.py covers
those with the shared text.
"""

from __future__ import annotations

from puregraphdb_spark.sql_fragments import (
    ASSET_MANIFEST_CTE_SPARKSQL,
    LANGID_PRED_CTE_SPARKSQL,
    LM_SCORED_CTES_SPARKSQL,
    TEXT_PROFILE_CTES_SPARKSQL,
)

#: name -> Spark SQL (run over the Engine's registered temp views)
SPARK_SQL: dict[str, str] = {
    # Langid kappa (q182): the shared prediction CTE in Spark
    # dialect, then the exact bigint kappa ratio.
    "q182_langid_kappa": LANGID_PRED_CTE_SPARKSQL + """,
        agg as (
          select source,
             cast(count(*) as bigint) as n_docs,
             cast(sum(case when lang = pred_lang then 1 else 0
                      end) as bigint) as n_agree,
             """ + ",\n             ".join(
        f"cast(sum(case when lang = '{l}' then 1 else 0 end)"
        f" as bigint) as r_{l},"
        f" cast(sum(case when pred_lang = '{l}' then 1 else 0"
        f" end) as bigint) as c_{l}"
        for l in ("en", "de", "es", "fr", "zh", "und")) + """
          from pred group by source)
        select source, n_docs, n_agree,
               cast(r_en*c_en + r_de*c_de + r_es*c_es + r_fr*c_fr
                    + r_zh*c_zh + r_und*c_und as bigint) as s_exp,
               case when n_docs*n_docs =
                         (r_en*c_en + r_de*c_de + r_es*c_es
                          + r_fr*c_fr + r_zh*c_zh + r_und*c_und)
                    then 0.0
                    else cast(round(cast(
                      cast(n_docs*n_agree
                           - (r_en*c_en + r_de*c_de + r_es*c_es
                              + r_fr*c_fr + r_zh*c_zh
                              + r_und*c_und) as double)
                      / cast(n_docs*n_docs
                           - (r_en*c_en + r_de*c_de + r_es*c_es
                              + r_fr*c_fr + r_zh*c_zh
                              + r_und*c_und) as double)
                      as decimal(28,10)), 6) as double) end
                 as kappa
        from agg order by source
    """,
    # Mann-Whitney U (q183): explode() replaces unnest([..]).
    "q183_mann_whitney": """
        with a as (
          select p.pair, 1 as is_a, value as v
          from events
          cross join (select explode(array('click','error','signup',
                                           'view')) as pair) p
          where event_type = 'purchase'),
        b as (
          select event_type as pair, 0 as is_a, value as v
          from events where event_type <> 'purchase'),
        u as (select * from a union all select * from b),
        ranked as (
          select pair, is_a,
             cast(rank() over (partition by pair order by v) * 2
                  + count(*) over (partition by pair, v) - 1
               as bigint) as avg2,
             cast(count(*) over (partition by pair, v)
               as bigint) as t
          from u),
        agg as (
          select pair,
             cast(sum(is_a) as bigint) as n_a,
             cast(sum(1 - is_a) as bigint) as n_b,
             cast(sum(case when is_a = 1 then avg2 else 0 end)
               as bigint) as ranksum2_a,
             cast(sum(t * t - 1) as bigint) as tie_sum
          from ranked group by pair)
        select pair, n_a, n_b,
               cast(ranksum2_a - n_a * (n_a + 1) as bigint) as u2,
               tie_sum,
               cast(round(cast(
                 cast(ranksum2_a - n_a * (n_a + 1) as double)
                 / cast(n_a * n_b as double) - 1.0
                 as decimal(28,10)), 6) as double)
                 as rank_biserial
        from agg order by pair
    """,
    # Benford (q184): 3-arg regexp_extract (Spark requires the
    # group index).
    "q184_benford": """
        with counted as (
          select regexp_extract(
                   cast(cast(l_extendedprice as decimal(18,2))
                        as string), '[1-9]', 0) as digit,
                 cast(count(*) as bigint) as n
          from lineitem
          group by 1),
        nz as (select * from counted where digit <> ''),
        tot as (select cast(sum(n) as bigint) as total from nz),
        ref as (
          select * from (values
            (1, 0.301029995663981), (2, 0.176091259055681),
            (3, 0.124938736608300), (4, 0.096910013008056),
            (5, 0.079181246047625), (6, 0.066946789630613),
            (7, 0.057991946977687), (8, 0.051152522447381),
            (9, 0.045757490560675)) as t(digit, b))
        select cast(nz.digit as int) as digit, nz.n,
               cast(round(cast(cast(nz.n as double)
                    / cast(tot.total as double)
                    as decimal(28,10)), 6) as double) as share,
               cast(round(cast(ref.b as double), 6) as double)
                 as benford,
               cast(round(cast(cast(nz.n as double)
                    / cast(tot.total as double)
                    - cast(ref.b as double)
                    as decimal(28,10)), 6) as double) as delta
        from nz cross join tot
        join ref on ref.digit = cast(nz.digit as int)
        order by digit
    """,
    # KS statistic (q186): explode() replaces unnest([..]).
    "q186_ks_statistic": """
        with a as (
          select p.pair, 1 as is_a, value as v
          from events
          cross join (select explode(array('click','error','signup',
                                           'view')) as pair) p
          where event_type = 'purchase'),
        b as (
          select event_type as pair, 0 as is_a, value as v
          from events where event_type <> 'purchase'),
        per_v as (
          select pair, v,
             cast(sum(is_a) as bigint) as ca,
             cast(sum(1 - is_a) as bigint) as cb
          from (select * from a union all select * from b)
          group by pair, v),
        cum as (
          select pair,
             cast(sum(ca) over (partition by pair order by v
                  rows between unbounded preceding and current
                  row) as bigint) as cum_a,
             cast(sum(cb) over (partition by pair order by v
                  rows between unbounded preceding and current
                  row) as bigint) as cum_b
          from per_v),
        tot as (
          select pair, cum_a, cum_b,
             max(cum_a) over (partition by pair) as n_a,
             max(cum_b) over (partition by pair) as n_b
          from cum)
        select pair,
               cast(max(n_a) as bigint) as n_a,
               cast(max(n_b) as bigint) as n_b,
               cast(max(abs(cum_a*n_b - cum_b*n_a)) as bigint)
                 as d_num,
               cast(round(cast(
                 cast(max(abs(cum_a*n_b - cum_b*n_a)) as double)
                 / cast(max(n_a)*max(n_b) as double)
                 as decimal(28,10)), 6) as double) as d
        from tot group by pair order by pair
    """,
    "q20_tumbling_window": """
        select w.start as win, event_type, count(*) as n,
               cast(round(sum(cast(value as decimal(28,3))), 2) as double)
                 as sum_val
        from (select window(ts, '1 hour') as w, event_type, value
              from events)
        group by w, event_type
        order by win, event_type
    """,
    "q22_json_extract": """
        select event_type,
               cast(round(cast(avg(cast(get_json_object(props, '$.k')
                       as double)) as decimal(28,8)), 4) as double) as avg_k
        from events group by event_type order by event_type
    """,
    "q27_text_tokens": """
        select tok, count(*) as tf
        from (select explode(split(lower(text), ' ')) as tok
              from documents)
        where tok <> ''
        group by tok order by tf desc, tok limit 20
    """,
    "q28_text_stats": """
        select lang, count(*) as n_docs,
               cast(round(cast(avg(n_chars) as decimal(28,6)), 2)
                 as double) as avg_chars,
               cast(round(cast(avg(size(split(text, ' ')))
                     as decimal(28,6)), 2) as double) as avg_tokens
        from documents group by lang order by lang
    """,
    "q29_knn_cosine": """
        with q as (
          select embedding as q_emb,
                 sqrt(aggregate(zip_with(cast(embedding as array<double>),
                                         cast(embedding as array<double>),
                                         (x, y) -> x * y),
                                cast(0 as double), (acc, x) -> acc + x))
                   as q_nrm,
                 vec_id as q_id
          from embeddings where vec_id = 0)
        select vec_id,
               round(aggregate(zip_with(cast(q.q_emb as array<double>),
                                        cast(e.embedding as array<double>),
                                        (x, y) -> x * y),
                               cast(0 as double), (acc, x) -> acc + x)
                     / (q.q_nrm *
                        sqrt(aggregate(zip_with(cast(e.embedding as array<double>),
                                                cast(e.embedding as array<double>),
                                                (x, y) -> x * y),
                                       cast(0 as double), (acc, x) -> acc + x))),
                     4) as cos_sim
        from embeddings e join q on e.vec_id <> q.q_id
        order by cos_sim desc, vec_id limit 10
    """,
    "q30_knn_label": """
        with q as (
          select vec_id as src, label as src_label,
                 cast(embedding as array<double>) as q_emb,
                 sqrt(aggregate(zip_with(cast(embedding as array<double>),
                                         cast(embedding as array<double>),
                                         (x, y) -> x * y),
                                cast(0 as double), (acc, x) -> acc + x))
                   as q_nrm
          from embeddings where vec_id < 20),
        sims as (
          select q.src, q.src_label, e.label as nbr_label, e.vec_id,
                 aggregate(zip_with(q.q_emb,
                                    cast(e.embedding as array<double>),
                                    (x, y) -> x * y),
                           cast(0 as double), (acc, x) -> acc + x)
                 / (q.q_nrm *
                    sqrt(aggregate(zip_with(cast(e.embedding as array<double>),
                                            cast(e.embedding as array<double>),
                                            (x, y) -> x * y),
                                   cast(0 as double), (acc, x) -> acc + x)))
                   as cs
          from embeddings e join q on e.vec_id <> q.src),
        ranked as (
          select src, src_label, nbr_label,
                 row_number() over (partition by src
                                    order by cs desc, vec_id) as rn
          from sims)
        select src, src_label, nbr_label, count(*) as votes
        from ranked where rn <= 5
        group by src, src_label, nbr_label
        order by src, votes desc, nbr_label
    """,
    "q31_asof_join": """
        select p.event_id, p.user_id, p.ts, c.ts as click_ts,
               round(c.value, 2) as click_val
        from (select event_id, user_id, ts from events
              where event_type = 'purchase') p
        join lateral (
          select c0.ts, c0.value from events c0
          where c0.event_type = 'click'
            and c0.user_id = p.user_id and c0.ts <= p.ts
          order by c0.ts desc limit 1) c
        order by p.event_id
    """,
    "q35_string_date": """
        select o_orderkey,
               lpad(cast(o_orderkey as string), 12, '0') as padded,
               reverse(substring(c_name, 1, 6)) as rev6,
               split_part(c_name, '#', 2) as cust_num,
               date_trunc('month', o_orderdate) as order_month
        from orders o join customer c on o.o_custkey = c.c_custkey
        where o.o_orderkey % 500 = 3 order by o_orderkey
    """,
    "q37_regex": """
        select c_mktsegment,
               count(case when c_name rlike '[0-9]{9}$' then 1 end)
                 as n_match,
               max(cast(regexp_extract(c_name, '([0-9]+)', 1) as bigint))
                 as max_id,
               min(regexp_replace(c_name, '[0-9]+', '#')) as min_masked
        from customer group by c_mktsegment order by c_mktsegment
    """,
    "q39_array_agg": """
        select n_name as nation,
               array_join(sort_array(collect_list(s_name)), ',')
                 as suppliers,
               count(*) as n_supp
        from supplier join nation on s_nationkey = n_nationkey
        group by n_name order by nation
    """,
    "q40_grouping_sets": """
        select coalesce(l_returnflag, 'ALL') as rf,
               coalesce(l_linestatus, 'ALL') as ls,
               cast(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    as bigint) as gid,
               count(*) as n, round(sum(l_quantity), 2) as sum_qty
        from lineitem
        group by grouping sets ((l_returnflag), (l_linestatus))
        order by rf, ls
    """,
    "q49_array_ops": """
        with per_nation as (
          select n_name,
                 array_sort(collect_set(s_suppkey % 10)) as buckets
          from supplier join nation on s_nationkey = n_nationkey
          group by n_name)
        select a.n_name as na, b.n_name as nb,
               cast(size(array_intersect(a.buckets, b.buckets)) as bigint)
                 as n_common
        from per_nation a join per_nation b on a.n_name < b.n_name
        order by na, nb limit 20
    """,
    "q50_gap_fill": """
        with daily as (
          select date_trunc('day', ts) as d, count(*) as cnt
          from events where event_type = 'purchase' group by 1
        ), bounds as (select min(d) as lo, max(d) as hi from daily)
        select gs.d, cast(coalesce(daily.cnt, 0) as bigint) as n
        from (select explode(sequence(lo, hi, interval 1 day)) as d
              from bounds) gs
        left join daily on gs.d = daily.d
        order by gs.d
    """,
    "q53_array_hof": """
        select label, count(*) as n,
               cast(round(cast(avg(array_max(embedding))
                     as decimal(28,8)), 6) as double) as avg_max_comp,
               cast(round(avg(size(filter(embedding, x -> x > 0))), 4)
                 as double) as avg_n_pos
        from embeddings group by label order by label
    """,
    "q58_bigrams": """
        with t as (
          select doc_id, pos, tok
          from documents
          lateral view posexplode(split(lower(text), ' ')) as pos, tok)
        select concat(a.tok, ' ', b.tok) as bigram, count(*) as tf
        from t a join t b on a.doc_id = b.doc_id and b.pos = a.pos + 1
        where a.tok <> '' and b.tok <> ''
        group by bigram order by tf desc, bigram limit 15
    """,
    "q62_json_typed": """
        select event_type,
               cast(sum(p.k) as bigint) as sum_k,
               count(case when p.k > 50 then 1 end) as n_high
        from (select event_type,
                     from_json(props, 'k INT, tag STRING') as p
              from events)
        group by event_type order by event_type
    """,
    "q63_ngram_jaccard": """
        with sh as (
          select doc_id,
                 -- length guard: sequence(1,0) is DESCENDING in Spark
                 -- (would fabricate shingles for <3-char docs);
                 -- mirrors operators/llm.py char_ngram_set
                 case when length(lower(text)) >= 3 then
                   array_distinct(transform(
                     sequence(1, length(lower(text)) - 2),
                     i -> substring(lower(text), i, 3)))
                 else cast(array() as array<string>) end as sh
          from documents),
        a as (select doc_id as src, sh as sh_a, size(sh) as na from sh
              where doc_id % 100 = 0),
        b as (select doc_id as dst, sh as sh_b, size(sh) as nb from sh)
        select src, dst,
               cast(round(cast(jac_raw as decimal(28,10)), 6) as double)
                 as jac
        from (
          -- size prefilter (J >= t needs min/max sizes >= t) mirrors
          -- llm.q63's cheap pre-intersect cut; results identical
          -- |A∪B| = na + nb − |A∩B| (sets are distinct): no union
          -- array is materialized, mirroring llm.q63
          select src, dst,
                 cast(size(array_intersect(sh_a, sh_b)) as double)
                 / cast(na + nb - size(array_intersect(sh_a, sh_b))
                        as double) as jac_raw
          from b join a on dst <> src
          where least(na, nb) * 5 >= greatest(na, nb) * 3)
        where jac_raw >= 0.6
        order by src, dst
    """,
    "q64_regex_tokens": """
        select lang, count(*) as n_docs,
               cast(sum(size(toks)) as bigint) as tot_tokens,
               cast(round(cast(avg(size(toks)) as decimal(28,8)), 4)
                 as double) as avg_tokens,
               cast(round(cast(avg(cast(size(array_distinct(toks))
                       as double) / cast(size(toks) as double))
                     as decimal(28,10)), 6) as double) as avg_uniq_ratio
        from (select lang,
                     regexp_extract_all(lower(text),
                       '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0) as toks
              from documents)
        group by lang order by lang
    """,
    "sliding_window_counts": """
        select win, event_type, cast(count(*) as bigint) as n
        from (
          select explode(sequence(
                   window(ts, '15 minutes').start - interval 45 minutes,
                   window(ts, '15 minutes').start,
                   interval 15 minutes)) as win,
                 event_type
          from events)
        group by win, event_type
        order by win, event_type
    """,
    "q66_contamination": """
        with ct as (select doc_id, split(lower(text), ' ') as ts
                    from documents),
        cg as (select doc_id as corpus_id,
                      case when size(ts) >= 5 then
                        array_distinct(transform(sequence(1, size(ts) - 4),
                          i -> array_join(slice(ts, i, 5), ' ')))
                      else cast(array() as array<string>) end as ng
               from ct),
        bt as (select doc_id,
                      split(lower(substring(text, 10, 200)), ' ') as ts
               from documents where doc_id % 97 = 0),
        bg as (select distinct bench_id, gram from (
                 select doc_id as bench_id,
                        explode(case when size(ts) >= 5 then
                          array_distinct(transform(sequence(1, size(ts) - 4),
                            i -> array_join(slice(ts, i, 5), ' ')))
                        else cast(array() as array<string>) end) as gram
                 from bt)),
        -- size staged BELOW the explode: in the same select it would
        -- plan above the Generate and rebuild the array per gram
        cx as (select corpus_id, n_ngrams, explode(ng) as gram
               from (select corpus_id,
                            cast(size(ng) as bigint) as n_ngrams, ng
                     from cg))
        select corpus_id, n_ngrams,
               count(distinct cx.gram) as n_matched,
               count(distinct bg.bench_id) as n_bench_docs,
               cast(round(cast(cast(count(distinct cx.gram) as double)
                       / n_ngrams as decimal(28,10)), 6) as double)
                 as contam_ratio
        from cx join bg on cx.gram = bg.gram
        group by corpus_id, n_ngrams
        order by corpus_id
    """,
    "hypertable_rollup": """
        with ev as (select ts, event_type, value from events),
        finest as (
          select window(ts, '15 minutes').start as bucket, event_type,
                 count(*) as n,
                 sum(cast(value as decimal(28,4))) as sum_val_d
          from ev group by 1, 2)
        select granularity, bucket, event_type, n,
               cast(round(sum_val_d, 2) as double) as sum_val
        from (
          select '15 minutes' as granularity, bucket, event_type,
                 n, sum_val_d
          from finest
          union all
          select '1 hour', window(bucket, '1 hour').start, event_type,
                 cast(sum(n) as bigint), sum(sum_val_d)
          from finest group by 2, 3
          union all
          select '1 day', window(bucket, '1 day').start, event_type,
                 cast(sum(n) as bigint), sum(sum_val_d)
          from finest group by 2, 3)
        order by granularity, bucket, event_type
    """,
    "q67_simhash_hamming": """
        with q as (select vec_id as src, embedding as q_emb
                   from embeddings where vec_id < 10),
        c as (select vec_id as dst, embedding from embeddings)
        select src, dst, ham, rn from (
          select src, dst, ham,
                 row_number() over (partition by src
                                    order by ham, dst) as rn
          from (select src, dst,
                  cast(size(filter(zip_with(q_emb, embedding,
                    (x, y) -> (x >= 0) != (y >= 0)), b -> b))
                    as bigint) as ham
                from c join q on dst != src))
        where rn <= 5 order by src, rn
    """,
    "q68_doc_chunks": """
        with ct as (select doc_id, split(lower(text), ' ') as ts
                    from documents)
        select doc_id,
               cast(floor((start - 1) / 24) as bigint) as chunk_id,
               cast(start as bigint) as start_pos,
               cast(size(slice(ts, start, 32)) as bigint) as n_tokens,
               md5(array_join(slice(ts, start, 32), ' ')) as chunk_hash
        from (select doc_id, ts,
                     explode(sequence(1, size(ts), 24)) as start
              from ct)
        order by doc_id, chunk_id
    """,
    "q70_tfidf": """
        with tk as (select doc_id, explode(split(lower(text), ' ')) as tok
                    from documents),
        tkf as (select * from tk where tok != ''),
        tf as (select doc_id, tok, count(*) as tf from tkf
               where doc_id % 10 = 0 group by doc_id, tok),
        df as (select tok, count(distinct doc_id) as df from tkf
               group by tok),
        n as (select count(*) as n_docs from documents)
        select doc_id, tok, tf, df, rn,
               cast(round(cast(tf * n_docs / df as decimal(28,8)), 4)
                 as double) as tfidf
        from (select f.doc_id, f.tok, f.tf, d.df, n.n_docs,
                     row_number() over (partition by f.doc_id
                       order by f.tf * n.n_docs / d.df desc, f.tok) as rn
              from tf f join df d using (tok) cross join n)
        where rn <= 3 order by doc_id, rn
    """,
    "q71_quality_filter": """
        with pd as (
          select lang,
                 cast(size(ts) as bigint) as n_tok,
                 aggregate(ts, cast(0 as bigint),
                           (acc, t) -> acc + length(t)) as tok_chars,
                 cast(size(array_distinct(ts)) as bigint) as n_uniq
          from (select lang,
                       filter(split(lower(text), ' '), t -> t != '') as ts
                from documents)),
        pm as (select lang, n_tok,
                      cast(tok_chars as double) / cast(n_tok as double)
                        as mean_len,
                      cast(n_uniq as double) / cast(n_tok as double)
                        as uniq_ratio
               from pd)
        select lang, count(*) as n_docs,
               cast(sum(case when n_tok >= 5
                              and mean_len between 2.0 and 12.0
                              and uniq_ratio >= 0.3
                         then 1 else 0 end) as bigint) as n_pass,
               cast(round(cast(avg(mean_len) as decimal(28,8)), 4)
                 as double) as avg_mean_len,
               cast(round(cast(avg(uniq_ratio) as decimal(28,10)), 6)
                 as double) as avg_uniq_ratio
        from pm group by lang order by lang
    """,
    "q72_langid_confusion": """
        with sc as (
          select lang,
             size(array_intersect(ts, array('the','and','of','to','is',
               'in','that','with'))) as s_en,
             size(array_intersect(ts, array('der','die','das','und','ist',
               'nicht','mit','ein'))) as s_de,
             size(array_intersect(ts, array('el','la','de','que','y',
               'los','es','una'))) as s_es,
             size(array_intersect(ts, array('le','la','et','les','des',
               'est','une','dans'))) as s_fr,
             size(array_intersect(ts, array('的','是','了','在','和',
               '有','我','不'))) as s_zh
          from (select lang,
                   array_distinct(filter(split(lower(text), '\\\\s+'),
                                         t -> t != '')) as ts
                from documents))
        select lang, pred_lang, count(*) as n_docs from (
          select lang,
             case when greatest(s_en,s_de,s_es,s_fr,s_zh) = 0 then 'und'
                  when s_en = greatest(s_en,s_de,s_es,s_fr,s_zh)
                    then 'en'
                  when s_de = greatest(s_de,s_es,s_fr,s_zh) then 'de'
                  when s_es = greatest(s_es,s_fr,s_zh) then 'es'
                  when s_fr = greatest(s_fr,s_zh) then 'fr'
                  else 'zh' end as pred_lang
          from sc)
        group by lang, pred_lang order by lang, pred_lang
    """,
    "q74_minhash_vocab": """
        with tk as (select doc_id, explode(split(lower(text), ' ')) as tok
                    from documents),
        tkf as (select * from tk where tok != ''),
        vocab as (select tok,
                         cast(row_number() over (order by tok) as bigint)
                           as tid
                  from (select distinct tok from tkf)),
        j as (select doc_id, tid from tkf join vocab using (tok)
              where doc_id % 20 = 0)
        select doc_id,
               min((tid *  823731426 +  433494437) % 2147483647) as minh0,
               min((tid * 1500450271 +     700001) % 2147483647) as minh1,
               min((tid *  713002666 +    1046527) % 2147483647) as minh2,
               min((tid * 1119516366 +   16769023) % 2147483647) as minh3,
               min((tid * 1251695901 + 1073676287) % 2147483647) as minh4,
               min((tid * 1278945319 +  479001599) % 2147483647) as minh5,
               min((tid * 2038074743 +   87178291) % 2147483647) as minh6,
               min((tid * 1912602701 + 2147483629) % 2147483647) as minh7
        from j group by doc_id order by doc_id
    """,
    "q75_pmi_bigrams": """
        with tk as (select split(lower(text), ' ') as ts from documents),
        bgp as (select p.a as tok_a, p.b as tok_b from (
                  select explode(filter(transform(
                    slice(ts, 1, greatest(size(ts) - 1, 0)),
                    (x, i) -> struct(x as a,
                                     element_at(ts, i + 2) as b)),
                    p -> p.a != '' and p.b != '')) as p
                  from tk)),
        bg as (select tok_a, tok_b, count(*) as cab from bgp
               group by tok_a, tok_b),
        uni as (select tok, count(*) as c from (
                  select explode(split(lower(text), ' ')) as tok
                  from documents) where tok != '' group by tok),
        t as (select sum(cab) as t_big from bg)
        select bigram, n,
               cast(round(cast(ratio_raw as decimal(28,8)), 4)
                 as double) as pmi_ratio
        from (select concat(bg.tok_a, ' ', bg.tok_b) as bigram,
                     bg.cab as n,
                     (cast(bg.cab as double) * cast(t.t_big as double))
                     / (cast(ua.c as double) * cast(ub.c as double))
                       as ratio_raw
              from bg join uni ua on ua.tok = bg.tok_a
              join uni ub on ub.tok = bg.tok_b
              cross join t
              where bg.cab >= 5)
        order by ratio_raw desc, bigram limit 15
    """,
    "q76_embed_quantize": """
        with v as (
          select label, cast(embedding as array<double>) as e,
                 cast(127.0 as double)
                 / greatest(array_max(transform(
                     cast(embedding as array<double>), x -> abs(x))),
                     1e-30) as scale
          from embeddings)
        select label, count(*) as n,
               cast(round(cast(avg(array_max(transform(e,
                       x -> abs(x - round(x * scale) / scale))))
                     as decimal(28,10)), 6) as double) as avg_max_err,
               cast(round(cast(avg(scale) as decimal(28,8)), 4)
                 as double) as avg_scale
        from v group by label order by label
    """,
    "q77_content_hash_dedup": """
        with h as (
          select doc_id,
                 md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ''), ' +', ' '))) as content_hash
          from documents)
        select doc_id, content_hash,
               count(*) over w as n_same,
               min(doc_id) over w as keeper,
               cast(doc_id != min(doc_id) over w as bigint) as is_dup
        from h window w as (partition by content_hash)
        order by doc_id
    """,
    "q79_vocab_coverage": """
        with tf as (select tok, count(*) as tf from (
                      select explode(split(lower(text), ' ')) as tok
                      from documents) where tok != '' group by tok),
        r as (select tf, tok,
                     row_number() over (order by tf desc, tok) as rnk
              from tf),
        c as (select rnk,
                     cast(sum(tf) over (order by rnk
                       rows between unbounded preceding and current row)
                       as bigint) as cum
              from r),
        t as (select cast(sum(tf) as bigint) as total from tf)
        select pct, min(rnk) as k_terms,
               min_by(cum, rnk) as cum_tokens,
               min(total) as total_tokens
        from c cross join t
        cross join (select explode(array(25, 50, 75, 90)) as pct)
        where cum * 100 >= pct * total
        group by pct order by pct
    """,
    "q81_repetition_filter": """
        with pd as (
          select lang,
                 cast(size(bigr) as bigint) as total,
                 cast(array_max(transform(array_distinct(bigr),
                   b -> size(filter(bigr, x -> x = b)))) as bigint) as top
          from (select lang,
                  case when size(ts) >= 2
                       then transform(sequence(1, size(ts) - 1),
                              i -> concat(element_at(ts, i), ' ',
                                          element_at(ts, i + 1)))
                       else cast(array() as array<string>) end as bigr
                from (select lang,
                        filter(split(lower(text), ' '), t -> t != '')
                          as ts
                      from documents)))
        select lang, count(*) as n_docs,
               cast(sum(case when total > 0 and
                   cast(top as double) / cast(total as double) > 0.05
                   then 1 else 0 end) as bigint) as n_flagged,
               cast(round(cast(avg(case when total > 0 then
                   cast(top as double) / cast(total as double) end)
                 as decimal(28,10)), 6) as double) as avg_top_frac
        from pd group by lang order by lang
    """,
    "q82_cosine_pairs": """
        with q as (
          select vec_id as a, cast(embedding as array<double>) as a_emb,
                 sqrt(aggregate(zip_with(cast(embedding as array<double>),
                                         cast(embedding as array<double>),
                                         (x, y) -> x * y),
                                cast(0.0 as double),
                                (acc, x) -> acc + x)) as a_nrm
          from embeddings where vec_id % 25 = 0),
        c as (
          select vec_id as b, cast(embedding as array<double>) as e,
                 sqrt(aggregate(zip_with(cast(embedding as array<double>),
                                         cast(embedding as array<double>),
                                         (x, y) -> x * y),
                                cast(0.0 as double),
                                (acc, x) -> acc + x)) as b_nrm
          from embeddings)
        select a, b, round(cs, 4) as cos_sim from (
          select a, b,
                 aggregate(zip_with(a_emb, e, (x, y) -> x * y),
                           cast(0.0 as double), (acc, x) -> acc + x)
                 / (a_nrm * b_nrm) as cs
          from c join q on a < b)
        where cs >= 0.3
        order by a, b
    """,
    "q84_winnow_fingerprint": """
        select doc_id, cast(size(wg) as bigint) as n_windows,
               array_min(wg) as fingerprint
        from (select doc_id,
                case when size(ts) >= 4
                     then transform(sequence(1, size(ts) - 3),
                            i -> md5(array_join(slice(ts, i, 4), ' ')))
                     else cast(array() as array<string>) end as wg
              from (select doc_id,
                      filter(split(lower(text), ' '), t -> t != '') as ts
                    from documents))
        order by doc_id
    """,
    "q88_retention": """
        with f as (select user_id, date_trunc('week', min(ts)) as cohort
                   from events group by user_id),
        a as (select distinct user_id, date_trunc('week', ts) as wk
              from events),
        j as (select f.cohort,
                     cast(floor(datediff(a.wk, f.cohort) / 7) as bigint)
                       as week_n
              from a join f on f.user_id = a.user_id),
        cs as (select cohort, count(*) as cohort_size from f
               group by cohort)
        select j.cohort, week_n, count(*) as n_active,
               min(cohort_size) as cohort_size,
               cast(round(cast(cast(count(*) as double)
                       / cast(min(cohort_size) as double)
                     as decimal(28,10)), 6) as double) as retention
        from j join cs on cs.cohort = j.cohort
        group by j.cohort, week_n
        order by j.cohort, week_n
    """,
    "q92_sequence_pack": """
        with t as (select lang, doc_id,
                     cast(size(filter(split(lower(text), ' '),
                       x -> x != '')) as bigint) as n_tok
                   from documents),
        p as (select lang, doc_id, n_tok,
                cast(floor(coalesce(sum(n_tok) over (
                  partition by lang order by doc_id
                  rows between unbounded preceding and 1 preceding),
                  0) / 256) as bigint) as pack_id
              from t)
        select lang, pack_id, count(*) as n_docs,
               sum(n_tok) as pack_tokens,
               min(doc_id) as first_doc, max(doc_id) as last_doc,
               cast(round(cast(cast(sum(n_tok) as double)
                     / cast(256 as double)
                     as decimal(28,10)), 6) as double) as fill_ratio
        from p group by lang, pack_id order by lang, pack_id
    """,
    "q93_minhash_bands": """
        with tk as (select doc_id,
                           explode(split(lower(text), ' ')) as tok
                    from documents),
        tkf as (select * from tk where tok != ''),
        vocab as (select tok,
                         cast(row_number() over (order by tok)
                           as bigint) as tid
                  from (select distinct tok from tkf)),
        j as (select doc_id, tid from tkf join vocab using (tok)),
        sig as (select doc_id,
                  min((tid *  823731426 +  433494437) % 2147483647)
                    as minh0,
                  min((tid * 1500450271 +     700001) % 2147483647)
                    as minh1,
                  min((tid *  713002666 +    1046527) % 2147483647)
                    as minh2,
                  min((tid * 1119516366 +   16769023) % 2147483647)
                    as minh3,
                  min((tid * 1251695901 + 1073676287) % 2147483647)
                    as minh4,
                  min((tid * 1278945319 +  479001599) % 2147483647)
                    as minh5,
                  min((tid * 2038074743 +   87178291) % 2147483647)
                    as minh6,
                  min((tid * 1912602701 + 2147483629) % 2147483647)
                    as minh7
                from j group by doc_id),
        bands as (
          select cast(0 as bigint) as band, minh0 as h1, minh1 as h2
          from sig
          union all select 1, minh2, minh3 from sig
          union all select 2, minh4, minh5 from sig
          union all select 3, minh6, minh7 from sig),
        sz as (select band, h1, h2, count(*) as s from bands
               group by 1, 2, 3)
        select band, count(*) as n_buckets,
               cast(sum(case when s > 1 then s else 0 end) as bigint)
                 as n_collide_docs,
               cast(sum(s * (s - 1)) div 2 as bigint)
                 as n_candidate_pairs
        from sz group by band order by band
    """,
    "q96_embedding_centroids": """
        select label, cast(dim as bigint) as dim, count(*) as n,
               cast(round(cast(avg(v) as decimal(28,8)), 6)
                 as double) as avg_comp
        from (select label,
                     posexplode(cast(embedding as array<double>))
                       as (dim, v)
              from embeddings)
        group by label, dim order by label, dim
    """,
    "q80_doc_embedding_join": """
        select doc_id, lang, label, n_chars,
               cast(size(filter(split(lower(text), ' '), t -> t != ''))
                 as bigint) as n_tokens,
               cast(round(cast(sqrt(aggregate(
                   zip_with(cast(embedding as array<double>),
                            cast(embedding as array<double>),
                            (x, y) -> x * y),
                   cast(0.0 as double), (acc, x) -> acc + x))
                 as decimal(28,8)), 6) as double) as l2_norm
        from documents d join embeddings e on d.doc_id = e.vec_id
        order by doc_id
    """,
    "q108_reorder_intervals": """
        with gaps as (
          select o_custkey,
                 cast(datediff(cast(o_orderdate as date),
                   cast(lag(o_orderdate) over (partition by o_custkey
                        order by o_orderdate, o_orderkey) as date))
                   as bigint) as gap_days
          from orders),
        g as (select * from gaps where gap_days is not null)
        select n_name, cast(count(*) as bigint) as n_gaps,
               cast(round(cast(cast(sum(gap_days) as double)
                    / cast(count(*) as double)
                    as decimal(28,10)), 4) as double) as avg_gap_days,
               max(gap_days) as max_gap_days
        from g join customer on c_custkey = o_custkey
              join nation on n_nationkey = c_nationkey
        group by n_name order by n_name
    """,
    "q102_boilerplate_shingles": """
        with t as (
            select doc_id, lang, split(text, ' ') as toks
            from documents),
        f as (select * from t where size(toks) >= 4),
        g as (
            select doc_id, lang, explode(transform(
                     sequence(1, size(toks) - 3),
                     i -> concat_ws(' ', slice(toks, i, 4)))) as sh
            from f),
        s as (select lang, sh, count(distinct doc_id) as nd
              from g group by lang, sh)
        select lang,
               cast(count(*) as bigint) as n_shingles,
               cast(sum(case when nd > 1 then 1 else 0 end)
                    as bigint) as n_shared,
               cast(round(cast(cast(sum(case when nd > 1 then 1 else 0 end)
                    as double) / cast(count(*) as double)
                    as decimal(28,10)), 6) as double) as shared_ratio
        from s group by lang order by lang
    """,
    "q109_cohort_ltv": """
        with first as (
          select o_custkey,
                 date_trunc('month', min(o_orderdate)) as cohort
          from orders group by o_custkey),
        sz as (select cohort, cast(count(*) as bigint) as n_cohort
               from first group by cohort),
        j as (select f.cohort,
                     cast((year(o.o_orderdate) - year(f.cohort)) * 12
                          + (month(o.o_orderdate) - month(f.cohort))
                       as bigint) as month_offset,
                     o.o_custkey,
                     cast(o.o_totalprice as decimal(28,2)) as p
              from orders o join first f on f.o_custkey = o.o_custkey),
        agg as (select cohort, month_offset,
                       cast(count(distinct o_custkey) as bigint) as n_active,
                       sum(p) as rev
                from j group by cohort, month_offset),
        cum as (select a.cohort, a.month_offset, a.n_active,
                       cast(a.rev as double) as revenue,
                       cast(sum(a.rev) over (
                            partition by a.cohort order by a.month_offset
                            rows between unbounded preceding
                                     and current row) * 100 as bigint)
                         as cum_cents,
                       cast(s.n_cohort as bigint) as n_cohort
                from agg a join sz s on s.cohort = a.cohort)
        select cohort, month_offset, n_active, revenue,
               cast((2 * cum_cents + n_cohort) div (2 * n_cohort)
                 as double) / 100.0 as ltv_per_cust
        from cum order by cohort, month_offset
    """,
    "q123_interval_union": """
        with e as (
          select user_id, event_id, unix_micros(ts) as s,
                 unix_micros(ts) + 300000000 as en
          from events),
        flagged as (
          select user_id, event_id, s, en,
                 case when max(en) over w1 is null
                        or s > max(en) over w1
                      then 1 else 0 end as nf
          from e
          window w1 as (partition by user_id order by s, event_id
                        rows between unbounded preceding
                        and 1 preceding)),
        isl as (
          select user_id, s, en,
                 sum(nf) over (partition by user_id
                               order by s, event_id
                               rows between unbounded preceding
                               and current row) as island
          from flagged),
        agg as (
          select user_id, island, min(s) as i_s, max(en) as i_e
          from isl group by user_id, island)
        select user_id,
               cast(count(*) as bigint) as n_islands,
               cast(sum(i_e - i_s) as bigint) as covered_us
        from agg group by user_id order by user_id
    """,
    "q124_time_to_convert": """
        with e as (
          select user_id, event_type, unix_micros(ts) as t
          from events
          where event_type in ('signup', 'purchase')),
        a as (
          select user_id, event_type, t,
                 min(case when event_type = 'signup' then t end)
                   over (partition by user_id) as f
          from e),
        g as (
          select user_id, min(t) as t_to, min(f) as t_f
          from a
          where event_type = 'purchase' and f is not null and t >= f
          group by user_id)
        select cast(floor((t_to - t_f) / 3600000000.0) as bigint)
                 as hours_bucket,
               cast(count(*) as bigint) as n_users
        from g group by hours_bucket order by hours_bucket
    """,
    "q126_token_diversity": """
        with tok as (
          select source as grp,
                 explode(split(lower(text), ' ')) as tok
          from documents),
        pt as (
          select grp, tok, cast(count(*) as bigint) as ct
          from tok where tok <> '' group by grp, tok),
        ag as (
          select grp,
                 cast(sum(ct) as bigint) as n_tokens,
                 cast(count(*) as bigint) as n_types,
                 sum(cast(ct as decimal(19,0))
                     * cast(ct as decimal(19,0))) as sq
          from pt group by grp)
        select grp as source, n_tokens, n_types,
               cast(round(cast(
                 cast(n_types as double) / cast(n_tokens as double)
                 as decimal(28,10)), 6) as double) as type_token_ratio,
               cast(round(cast(
                 1.0d - cast(sq as double)
                   / (cast(n_tokens as double)
                      * cast(n_tokens as double))
                 as decimal(28,10)), 6) as double) as simpson_index
        from ag order by source
    """,
    "q127_asof_forward": """
        with c as (
          select event_id, user_id, ts from events
          where event_type = 'click'),
        p as (
          select user_id, ts, min(value) as value from events
          where event_type = 'purchase' group by user_id, ts),
        u as (
          select user_id, ts, 1 as side,
                 event_id, cast(null as timestamp) as pts,
                 cast(null as double) as pval
          from c
          union all
          select user_id, ts, 2 as side,
                 cast(null as bigint), ts, value
          from p),
        f as (
          select user_id, ts, side, event_id,
                 first_value(pts, true) over w as n_ts,
                 first_value(pval, true) over w as n_val
          from u
          window w as (partition by user_id order by ts, side
                       rows between current row
                       and unbounded following))
        select event_id, user_id, ts, n_ts as next_ts,
               n_val as next_val
        from f where side = 1 and n_ts is not null
        order by event_id
    """,
    "q128_gini_concentration": """
        with spend as (
          select o_custkey,
                 sum(cast(o_totalprice as decimal(18,2))) as sp
          from orders group by o_custkey),
        ranked as (
          select sp, row_number() over (order by sp, o_custkey) as rk
          from spend),
        tot as (
          select cast(count(*) as bigint) as n, sum(sp) as s0
          from spend),
        stats as (
          select min(n) as n_keys, min(s0) as s0m,
                 sum(rk * sp) as s1,
                 sum(case when rk > n - (n div 10) then sp end) as topd
          from ranked cross join tot)
        select n_keys,
               cast(round(cast(
                 cast(2 * s1 - (n_keys + 1) * s0m as double)
                   / (cast(n_keys as double) * cast(s0m as double))
                 as decimal(28,10)), 6) as double) as gini,
               cast(round(cast(
                 cast(topd as double) / cast(s0m as double)
                 as decimal(28,10)), 6) as double) as top_decile_share
        from stats
    """,
    "q131_dup_cluster_histogram": """
        with h as (
          select md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^a-z0-9 ]', ''), ' +', ' '))) as content_hash
          from documents),
        clusters as (
          select content_hash, cast(count(*) as bigint) as size
          from h group by content_hash)
        select size, cast(count(*) as bigint) as n_clusters,
               cast(size * count(*) as bigint) as n_docs,
               cast(greatest(size - 1, 0) * count(*) as bigint)
                 as n_removable
        from clusters group by size order by size
    """,
    "q132_funnel_latency": """
        with v as (select user_id, min(ts) as t1 from events
                   where event_type = 'view' group by user_id),
        c as (select e.user_id, min(e.ts) as t2
              from events e join v on v.user_id = e.user_id
              where e.event_type = 'click' and e.ts > v.t1
              group by e.user_id),
        p as (select e.user_id, min(e.ts) as t3
              from events e join c on c.user_id = e.user_id
              where e.event_type = 'purchase' and e.ts > c.t2
              group by e.user_id),
        trans as (
          select 'view>click' as transition,
                 cast(unix_micros(c.t2) - unix_micros(v.t1) as double)
                   / 1e6 as latency_s
          from c join v using (user_id)
          union all
          select 'click>purchase',
                 cast(unix_micros(p.t3) - unix_micros(c.t2) as double)
                   / 1e6
          from p join c using (user_id))
        select transition, cast(count(*) as bigint) as n_users,
               cast(round(cast(percentile(latency_s, 0.5)
                 as decimal(28,6)), 4) as double) as median_s,
               cast(round(cast(percentile(latency_s, 0.9)
                 as decimal(28,6)), 4) as double) as p90_s
        from trans group by transition order by transition
    """,
    "q133_chi_square": """
        with cells as (
          select c.c_mktsegment as rseg, o.o_orderpriority as cpri,
                 cast(count(*) as bigint) as o
          from orders o join customer c on o.o_custkey = c.c_custkey
          group by rseg, cpri),
        scored as (
          select o,
                 sum(o) over (partition by rseg) as r,
                 sum(o) over (partition by cpri) as c,
                 sum(o) over () as n,
                 size(collect_set(rseg) over ()) as nr,
                 size(collect_set(cpri) over ()) as nc
          from cells),
        terms as (
          select o, r, c, n, nr, nc,
                 cast((cast(o as double)
                       - cast(r as double) * cast(c as double)
                         / cast(n as double))
                      * (cast(o as double)
                         - cast(r as double) * cast(c as double)
                           / cast(n as double))
                      / (cast(r as double) * cast(c as double)
                         / cast(n as double))
                   as decimal(28,12)) as term
          from scored)
        select cast(min(n) as bigint) as n,
               cast((min(nr) - 1) * (min(nc) - 1) as bigint) as dof,
               cast(round(cast(cast(sum(term) as double)
                 as decimal(28,10)), 6) as double) as chi2,
               cast(round(cast(
                 sqrt(cast(sum(term) as double)
                      / (cast(min(n) as double)
                         * cast(least(min(nr) - 1, min(nc) - 1)
                                as double)))
                 as decimal(28,10)), 6) as double) as cramers_v
        from terms
    """,
    "q134_cross_source_shingles": """
        with t as (select source, split(text, ' ') as toks
                   from documents),
        f as (select * from t where size(toks) >= 4),
        g as (
            select distinct source,
                   concat_ws(' ', slice(toks, i, 4)) as sh
            from f lateral view explode(sequence(1, size(toks) - 3))
                 u as i),
        v as (select source, cast(count(*) as bigint) as n_sh
              from g group by source),
        o as (
            select a.source as src_a, b.source as src_b,
                   cast(count(*) as bigint) as n_shared
            from g a join g b on a.sh = b.sh and a.source < b.source
            group by 1, 2)
        select src_a, src_b, va.n_sh as n_a, vb.n_sh as n_b, n_shared,
               cast(round(cast(
                    cast(n_shared as double)
                    / cast(va.n_sh + vb.n_sh - n_shared as double)
                    as decimal(28,10)), 6) as double) as jaccard
        from o
        join v va on va.source = o.src_a
        join v vb on vb.source = o.src_b
        order by src_a, src_b
    """,
    "q135_anomaly_mad_ts": """
        with daily as (
            select date_trunc('day', ts) as day,
                   cast(count(*) as bigint) as cnt
            from events group by 1),
        m as (select percentile(cnt, 0.5) as med from daily),
        dev as (
            select day, cnt, med, abs(cnt - med) as dev
            from daily cross join m),
        md as (select percentile(dev, 0.5) as mad from dev)
        select day, cnt,
               cast(round(cast(med as decimal(28,6)), 4) as double)
                 as med,
               cast(round(cast(mad as decimal(28,6)), 4) as double)
                 as mad,
               cast(round(cast(
                    case when mad > 0 then (cnt - med) / mad
                         else null end
                    as decimal(28,8)), 6) as double) as score,
               cast(case when mad > 0 and abs((cnt - med) / mad) > 3.5
                    then 1 else 0 end as bigint) as is_anomaly
        from dev cross join md order by day
    """,
    "q137_source_mix_budget": """
        with per as (
            select source, cast(count(*) as bigint) as n_docs,
                   sum(cast(size(filter(split(text, ' '),
                                        t -> t <> '')) as bigint))
                     as tokens
            from documents group by source),
        s1 as (
            select source, n_docs, tokens,
                   cast(floor(sum(tokens) over () * 50 / 100)
                        as bigint) as budget,
                   least(tokens,
                         cast(floor(
                             cast(floor(sum(tokens) over ()
                                        * 50 / 100) as bigint)
                             / count(*) over ()) as bigint)) as alloc1
            from per),
        s2 as (
            select source, n_docs, tokens, alloc1,
                   budget - sum(alloc1) over () as leftover,
                   tokens - alloc1 as cap,
                   sum(tokens - alloc1) over () as cap_total
            from s1),
        s3 as (
            select source, n_docs, tokens,
                   alloc1 + case when cap_total > 0
                       then least(cap, cast(floor(
                            leftover * cap / cap_total) as bigint))
                       else 0 end as alloc2
            from s2)
        select source, n_docs, tokens,
               cast(alloc2 as bigint) as alloc_tokens,
               cast(round(cast(
                    cast(alloc2 as double) / cast(tokens as double)
                    as decimal(28,8)), 6) as double) as sample_rate
        from s3 order by source
    """,
    "q138_seasonal_dow": """
        with per as (
            select event_type,
                   cast(pmod(dayofweek(ts) + 5, 7) + 1 as bigint)
                     as isodow,
                   cast(count(*) as bigint) as cnt
            from events group by 1, 2)
        select event_type, isodow, cnt,
               cast(round(cast(
                    cast(cnt * 7 as double)
                    / cast(sum(cnt) over (partition by event_type)
                           as double)
                    as decimal(28,8)), 6) as double) as dow_index
        from per order by event_type, isodow
    """,
    "q141_split_contamination": """
        with assigned as (
            select doc_id as doc,
                   case when (doc_id * 2654435761) % 4294967296
                             % 100 < 80 then 'train'
                        when (doc_id * 2654435761) % 4294967296
                             % 100 < 90 then 'val'
                        else 'test' end as split,
                   split(text, ' ') as toks
            from documents),
        f as (select * from assigned where size(toks) >= 4),
        sh as (
            select split, doc,
                   concat_ws(' ', slice(toks, i, 4)) as sh
            from f lateral view explode(sequence(1, size(toks) - 3))
                 u as i),
        train_vocab as (
            select distinct sh from sh where split = 'train'),
        held_sh as (
            select distinct split, sh from sh where split <> 'train'),
        sh_stats as (
            select h.split,
                   cast(count(*) as bigint) as n_shingles,
                   cast(sum(case when t.sh is not null
                            then 1 else 0 end) as bigint) as n_leaked
            from held_sh h left join train_vocab t on h.sh = t.sh
            group by h.split),
        held_docs as (
            select distinct split, doc from sh where split <> 'train'),
        leaked_docs as (
            select distinct s.split, s.doc
            from sh s join train_vocab t on s.sh = t.sh
            where s.split <> 'train'),
        doc_stats as (
            select hd.split,
                   cast(count(*) as bigint) as n_docs,
                   cast(sum(case when ld.doc is not null
                            then 1 else 0 end) as bigint)
                     as n_docs_leaked
            from held_docs hd
            left join leaked_docs ld
              on hd.split = ld.split and hd.doc = ld.doc
            group by hd.split)
        select s.split, n_shingles, n_leaked,
               cast(round(cast(
                    cast(n_leaked as double)
                    / cast(n_shingles as double)
                    as decimal(28,10)), 6) as double)
                 as shingle_leak_ratio,
               n_docs, n_docs_leaked,
               cast(round(cast(
                    cast(n_docs_leaked as double)
                    / cast(n_docs as double)
                    as decimal(28,10)), 6) as double) as doc_leak_ratio
        from sh_stats s join doc_stats d on s.split = d.split
        order by s.split
    """,
    "q142_vocab_growth": """
        with toks as (
            select doc_id as doc, tok
            from documents
            lateral view explode(split(text, ' ')) t as tok
            where tok <> ''),
        firsts as (
            select tok, min(doc) as first_doc from toks group by tok),
        m as (select max(doc_id) as mx from documents),
        pcts as (
            select pct, mx
            from m lateral view explode(sequence(10, 100, 10))
                 p as pct)
        select cast(pct as bigint) as pct,
               cast(count(*) as bigint) as vocab_size
        from firsts cross join pcts
        where first_doc <= floor(mx * pct / 100)
        group by pct order by pct
    """,
    "q143_seasonal_burst": """
        with per as (
            select event_type, date_trunc('hour', ts) as bucket,
                   cast(count(*) as bigint) as cnt
            from events group by 1, 2),
        tagged as (
            select event_type, bucket, cnt,
                   cast(pmod(dayofweek(bucket) + 5, 7) + 1 as bigint)
                     as isodow
            from per),
        st as (
            select event_type, isodow, bucket, cnt,
                   count(*) over (partition by event_type, isodow)
                     as n,
                   sum(cnt) over (partition by event_type, isodow)
                     as s,
                   sum(cnt * cnt) over (partition by event_type,
                                        isodow) as ss
            from tagged),
        sc as (
            select event_type, isodow, bucket, cnt,
                   cast(s as double) / cast(n as double) as mean,
                   cast(n * ss - s * s as double)
                   / cast(n * (n - 1) as double) as var
            from st where n >= 2)
        select event_type, isodow, bucket, cnt,
               cast(round(cast(mean as decimal(28,6)), 4) as double)
                 as stratum_mean,
               cast(round(cast(
                    (cast(cnt as double) - mean) / sqrt(var)
                    as decimal(28,6)), 4) as double) as z
        from sc
        where var > 0
          and (cast(cnt as double) - mean) / sqrt(var) > 2.0
        order by event_type, bucket
    """,
    "q144_dedup_impact": """
        with per_hash as (
            select source,
                   md5(trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', ''),
                       ' +', ' '))) as h,
                   cast(count(*) as bigint) as c
            from documents group by 1, 2)
        select source,
               cast(sum(c) as bigint) as n_docs,
               cast(count(*) as bigint) as n_unique,
               cast(sum(c) - count(*) as bigint) as n_removable,
               cast(round(cast(
                    cast(sum(c) - count(*) as double)
                    / cast(sum(c) as double)
                    as decimal(28,10)), 6) as double) as dup_ratio
        from per_hash group by source order by source
    """,
    "q145_substring_dedup": """
        with base as (
            select doc_id, source,
                   filter(split(lower(text), ' '), t -> t <> '') as toks
            from documents),
        st as (select doc_id, source, size(toks) as n_toks, toks
               from base),
        stf as (select * from st where n_toks >= 8),
        sh as (
            select doc_id, source, p0 + 1 as pos, sh
            from stf
            lateral view posexplode(transform(sequence(1, n_toks - 7),
                i -> md5(array_join(slice(toks, i, 8), ' '))))
              t as p0, sh),
        dup as (select sh from sh group by sh
                having min(doc_id) <> max(doc_id)),
        dp as (select s.doc_id, s.source, s.pos
               from sh s join dup d on s.sh = d.sh),
        lg as (select doc_id, source, pos,
                      lag(pos) over (partition by doc_id
                                     order by pos) as prev
               from dp),
        isl as (select doc_id, source, pos,
                       sum(case when pos - prev > 8 then 1 else 0 end)
                         over (partition by doc_id order by pos
                               rows between unbounded preceding
                               and current row) as grp
                from lg),
        spans as (select doc_id, source,
                         max(pos) - min(pos) + 8 as span_tokens
                  from isl group by doc_id, source, grp),
        per_doc as (select source, doc_id, count(*) as n_spans,
                           sum(span_tokens) as covered,
                           max(span_tokens) as mx
                    from spans group by 1, 2),
        tot as (select source, cast(count(*) as bigint) as n_docs,
                       cast(sum(n_toks) as bigint) as total_tokens
                from st group by source),
        agg as (select source,
                       cast(count(*) as bigint) as n_docs_with_repeat,
                       cast(sum(n_spans) as bigint) as n_spans,
                       cast(sum(covered) as bigint) as dup_tokens,
                       cast(max(mx) as bigint) as max_span_tokens
                from per_doc group by source)
        select t.source, t.n_docs, t.total_tokens,
               cast(coalesce(a.n_docs_with_repeat, 0) as bigint)
                 as n_docs_with_repeat,
               cast(coalesce(a.n_spans, 0) as bigint) as n_spans,
               cast(coalesce(a.dup_tokens, 0) as bigint) as dup_tokens,
               cast(coalesce(a.max_span_tokens, 0) as bigint)
                 as max_span_tokens,
               cast(round(cast(
                    cast(coalesce(a.dup_tokens, 0) as double)
                    / cast(t.total_tokens as double)
                    as decimal(28,10)), 6) as double) as dup_token_ratio
        from tot t left join agg a on a.source = t.source
        order by t.source
    """,
    "q146_pii_scan": """
        with planted as (
            select source,
                   concat(text,
                       case when doc_id % 7 = 0 then
                           concat(' contact user',
                                  cast(doc_id as string), '@example.com')
                       else '' end,
                       case when doc_id % 11 = 0 then
                           concat(' call +1-555-867-',
                                  lpad(cast(doc_id % 10000 as string),
                                       4, '0'))
                       else '' end,
                       case when doc_id % 13 = 0 then
                           concat(' from 10.',
                                  cast(doc_id % 256 as string), '.',
                                  cast(doc_id % 100 as string), '.',
                                  cast(doc_id % 250 + 1 as string))
                       else '' end) as text
            from documents),
        per_doc as (
            select source,
                   cast(size(regexp_extract_all(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]{2,}'
                       , 0)) as bigint) as e,
                   cast(size(regexp_extract_all(text,
                       '\\\\+[0-9]{1,2}[- ][0-9]{3}[- ][0-9]{3}[- ][0-9]{4}'
                       , 0)) as bigint) as p,
                   cast(size(regexp_extract_all(text,
                       '[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}'
                       , 0)) as bigint) as i
            from planted)
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(case when e + p + i > 0 then 1 else 0 end)
                    as bigint) as docs_with_pii,
               cast(sum(e) as bigint) as n_email,
               cast(sum(p) as bigint) as n_phone,
               cast(sum(i) as bigint) as n_ipv4,
               cast(round(cast(
                    cast(sum(case when e + p + i > 0 then 1 else 0 end)
                         as double)
                    / cast(count(*) as double)
                    as decimal(28,10)), 6) as double) as pii_doc_ratio
        from per_doc group by source order by source
    """,
    "q147_token_length_profile": """
        with per_doc as (
            select source,
                   cast(size(filter(split(lower(text), ' '),
                        t -> t <> '')) as bigint) as n_toks
            from documents),
        tot as (
            select source, cast(count(*) as bigint) as n_docs,
                   cast(sum(n_toks) as bigint) as total_tokens
            from per_doc group by source),
        ranked as (
            select source, n_toks,
                   row_number() over (partition by source
                                      order by n_toks) as rn,
                   count(*) over (partition by source) as n
            from per_doc),
        picks as (
            select source,
                   max(case when rn = greatest(cast(floor(
                       (25*n+99)/100) as bigint), cast(1 as bigint))
                       then n_toks end) as p25_tokens,
                   max(case when rn = greatest(cast(floor(
                       (50*n+99)/100) as bigint), cast(1 as bigint))
                       then n_toks end) as p50_tokens,
                   max(case when rn = greatest(cast(floor(
                       (90*n+99)/100) as bigint), cast(1 as bigint))
                       then n_toks end) as p90_tokens,
                   max(case when rn = greatest(cast(floor(
                       (99*n+99)/100) as bigint), cast(1 as bigint))
                       then n_toks end) as p99_tokens
            from ranked group by source)
        select t.source, t.n_docs, t.total_tokens,
               p.p25_tokens, p.p50_tokens, p.p90_tokens, p.p99_tokens
        from tot t join picks p on t.source = p.source
        order by t.source
    """,
    "q148_benchmark_attribution": """
        with benches as (
            select 'bench_a' as bench, substring(text, 10, 200) as text
            from documents where doc_id % 97 = 0
            union all
            select 'bench_b', substring(text, 30, 200)
            from documents where doc_id % 89 = 0
            union all
            select 'bench_c', substring(text, 50, 200)
            from documents where doc_id % 83 = 0),
        bt as (select bench, split(lower(text), ' ') as ts from benches),
        bg as (select distinct bench, gram from (
                 select bench,
                        explode(case when size(ts) >= 5 then
                          transform(sequence(1, size(ts) - 4),
                            i -> array_join(slice(ts, i, 5), ' '))
                        else cast(array() as array<string>) end) as gram
                 from bt)),
        ct as (select source, doc_id as doc, split(lower(text), ' ') as ts
               from documents),
        cg as (select source, doc,
                      explode(case when size(ts) >= 5 then
                        array_distinct(transform(sequence(1, size(ts) - 4),
                          i -> array_join(slice(ts, i, 5), ' ')))
                      else cast(array() as array<string>) end) as gram
               from ct),
        hits as (
            select source, bench,
                   cast(count(*) as bigint) as n_contaminated
            from (select distinct cg.source, cg.doc, bg.bench
                  from cg join bg on cg.gram = bg.gram)
            group by source, bench),
        totals as (select source, cast(count(*) as bigint) as n_docs
                   from documents group by source),
        grid as (select t.source, b.bench, t.n_docs
                 from totals t
                 cross join (select distinct bench from benches) b)
        select g.source, g.bench, g.n_docs,
               cast(coalesce(h.n_contaminated, 0) as bigint)
                 as n_contaminated,
               cast(round(cast(
                    cast(coalesce(h.n_contaminated, 0) as double)
                    / cast(g.n_docs as double)
                    as decimal(28,10)), 6) as double) as contam_doc_ratio
        from grid g left join hits h
          on g.source = h.source and g.bench = h.bench
        order by g.source, g.bench
    """,
    "q149_doc_stitching": """
        with base as (
            select doc_id as doc, source as src,
                   filter(split(lower(text), ' '), t -> t <> '') as toks
            from documents),
        st as (select doc, src, size(toks) as n, toks
               from base where size(toks) >= 6),
        edges as (
            select doc, src,
                   md5(array_join(slice(toks, 1, 3), ' ')) as head,
                   md5(array_join(slice(toks, n - 2, 3), ' ')) as tail
            from st),
        pairs as (
            select t.src as src_from, h.src as src_to,
                   t.doc as doc_from, h.doc as doc_to
            from edges t join edges h on t.tail = h.head
            where t.doc <> h.doc)
        select src_from, src_to,
               cast(count(*) as bigint) as n_pairs,
               cast(count(distinct doc_from) as bigint) as n_from_docs,
               cast(count(distinct doc_to) as bigint) as n_to_docs
        from pairs group by src_from, src_to
        order by src_from, src_to
    """,
    "q150_embedding_drift": """
        with ex as (
            select label, posexplode(embedding) as (dim, v)
            from embeddings),
        comp as (
            select label, dim,
                   cast(count(*) as bigint) as n_vecs,
                   cast(round(cast(avg(cast(v as double))
                        as decimal(28,8)), 6) as decimal(18,6)) as c
            from ex group by label, dim),
        gcent as (
            select dim,
                   cast(round(cast(avg(cast(v as double))
                        as decimal(28,8)), 6) as decimal(18,6)) as g
            from ex group by dim)
        select comp.label,
               cast(max(n_vecs) as bigint) as n_vecs,
               -- cast the DIFFERENCE down to decimal(18,6) before
               -- squaring: decimal(19,6)^2 needs 39 digits and Spark
               -- silently re-types it decimal(38,11), rounding away
               -- small drift; decimal(18,6)^2 = decimal(37,12) exact
               cast(round(cast(sqrt(cast(sum(
                    cast(cast(c - g as decimal(18,6))
                         * cast(c - g as decimal(18,6))
                         as decimal(38,12))
                    ) as double)) as decimal(28,10)), 6) as double)
                 as drift_l2
        from comp join gcent on comp.dim = gcent.dim
        group by comp.label order by comp.label
    """,
    # SemDeDup hash-cluster twin (q151): same greedy keep order as
    # operators/similarity.semantic_prune — "earlier in (csim asc,
    # vec_id asc)" becomes the self-join predicate; the pairwise
    # cosine is the identical dot/(nrm_x*nrm_y) sequential fold, so
    # the SQL door reproduces the DataFrame door bit-for-bit.
    "q151_hash_semantic_dedup": """
        with assigned as (
            select vec_id, cast(embedding as array<double>) as emb,
                   cast(vec_id % 16 as int) as cluster
            from embeddings),
        ex as (
            select cluster, posexplode(emb) as (dim, v) from assigned),
        comp as (
            select cluster, dim,
                   cast(round(cast(avg(v) as decimal(28,8)), 6)
                     as double) as c
            from ex group by cluster, dim),
        cent as (
            select cluster,
                   transform(array_sort(collect_list(struct(dim, c))),
                             x -> x.c) as cvec
            from comp group by cluster),
        scored as (
            select a.vec_id, a.cluster, a.emb,
                   sqrt(aggregate(zip_with(a.emb, a.emb,
                                           (x, y) -> x * y),
                                  cast(0 as double),
                                  (acc, p) -> acc + p)) as nrm,
                   aggregate(zip_with(a.emb, c.cvec, (x, y) -> x * y),
                             cast(0 as double), (acc, p) -> acc + p)
                   / (sqrt(aggregate(zip_with(a.emb, a.emb,
                                              (x, y) -> x * y),
                                     cast(0 as double),
                                     (acc, p) -> acc + p))
                      * sqrt(aggregate(zip_with(c.cvec, c.cvec,
                                                (x, y) -> x * y),
                                       cast(0 as double),
                                       (acc, p) -> acc + p))) as csim
            from assigned a join cent c on a.cluster = c.cluster),
        agg as (
            select x.vec_id, x.cluster, x.csim,
                   count(case when
                         aggregate(zip_with(x.emb, y.emb,
                                            (p, q) -> p * q),
                                   cast(0 as double),
                                   (acc, p) -> acc + p)
                           / (x.nrm * y.nrm) >= 0.3D
                         then 1 end) as nd
            from scored x left join scored y
              on y.cluster = x.cluster
             and (y.csim < x.csim
                  or (y.csim = x.csim and y.vec_id < x.vec_id))
            group by x.vec_id, x.cluster, x.csim)
        select vec_id,
               cast(cluster as bigint) as cluster,
               cast(round(cast(csim as decimal(28,10)), 6) as double)
                 as centroid_sim,
               cast(nd as bigint) as n_earlier_dups,
               cast(case when nd = 0 then 1 else 0 end as bigint)
                 as kept
        from agg order by vec_id
    """,
    # Tokenizer fertility twin (q152): same planted version/rank
    # suffix, Spark HOF spellings of the word/token counts.
    "q152_tokenizer_fertility": """
        with rich as (
            select source,
                   concat(text, ' v', cast(doc_id % 10 as string),
                          '.', cast(doc_id % 7 as string), ' rank#',
                          cast(doc_id % 100 as string), '!') as text
            from documents),
        per_doc as (
            select source,
                   cast(length(text) as bigint) as n_chars,
                   cast(size(filter(split(lower(text), ' '),
                        x -> x != '')) as bigint) as n_words,
                   cast(size(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)) as bigint)
                     as n_tokens
            from rich)
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(n_chars) as bigint) as total_chars,
               cast(sum(n_words) as bigint) as total_words,
               cast(sum(n_tokens) as bigint) as total_tokens,
               cast(round(cast(cast(sum(n_tokens) as double)
                    / cast(sum(n_words) as double)
                    as decimal(28,10)), 6) as double)
                 as tokens_per_word,
               cast(round(cast(cast(sum(n_tokens) as double)
                    / cast(sum(n_chars) as double)
                    as decimal(28,10)), 6) as double)
                 as tokens_per_char
        from per_doc group by source order by source
    """,
    # Provenance dedup twin (q153): same planted domain grain and
    # syndicated residue class, Spark regexp_replace (implicit 'g').
    "q153_provenance_dedup": """
        with planted as (
            select concat(source, '.d', cast(doc_id % 3 as string))
                     as domain,
                   case when doc_id % 37 = 0
                        then concat('syndicated boilerplate item ',
                                    cast(doc_id % 5 as string))
                        else text end as text
            from documents),
        per_hash as (
            select domain,
                   md5(trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', ''),
                       ' +', ' '))) as h,
                   cast(count(*) as bigint) as c
            from planted group by 1, 2),
        hd as (
            select h, cast(count(*) as bigint) as nd
            from per_hash group by h)
        select domain,
               cast(sum(c) as bigint) as n_docs,
               cast(count(*) as bigint) as n_unique,
               cast(sum(c) - count(*) as bigint) as n_removable,
               cast(sum(case when nd >= 2 then 1 else 0 end)
                 as bigint) as n_mirrored,
               cast(round(cast(
                    cast(sum(case when nd >= 2 then 1 else 0 end)
                         as double)
                    / cast(count(*) as double)
                    as decimal(28,10)), 6) as double) as mirror_ratio
        from per_hash join hd using (h)
        group by domain order by domain
    """,
    # BM25 (rational-idf) twin (q154): Spark HOF spellings, identical
    # expression association as the DataFrame door.
    "q154_bm25_topk": """
        with per_doc as (
            select doc_id,
                   cast(size(toks) as bigint) as dl,
                   cast(size(filter(toks, t -> t = 'spark'))
                     as bigint) as tf0,
                   cast(size(filter(toks, t -> t = 'join'))
                     as bigint) as tf1,
                   cast(size(filter(toks, t -> t = 'fast'))
                     as bigint) as tf2
            from (select doc_id,
                         filter(split(lower(text), ' '),
                                t -> t != '') as toks
                  from documents)),
        stats as (
            select cast(count(*) as bigint) as n_corpus,
                   cast(sum(dl) as bigint) as total_dl,
                   cast(sum(case when tf0 > 0 then 1 else 0 end)
                     as bigint) as df0,
                   cast(sum(case when tf1 > 0 then 1 else 0 end)
                     as bigint) as df1,
                   cast(sum(case when tf2 > 0 then 1 else 0 end)
                     as bigint) as df2
            from per_doc),
        scored as (
            select doc_id, dl, tf0, tf1, tf2,
                   (cast(n_corpus - df0 as double) + 0.5D)
                     / (cast(df0 as double) + 0.5D)
                     * (cast(tf0 as double) * 2.2D)
                     / (cast(tf0 as double) + 1.2D
                        * (1.0D - 0.75D + 0.75D * cast(dl as double)
                           / (cast(total_dl as double)
                              / cast(n_corpus as double))))
                 + (cast(n_corpus - df1 as double) + 0.5D)
                     / (cast(df1 as double) + 0.5D)
                     * (cast(tf1 as double) * 2.2D)
                     / (cast(tf1 as double) + 1.2D
                        * (1.0D - 0.75D + 0.75D * cast(dl as double)
                           / (cast(total_dl as double)
                              / cast(n_corpus as double))))
                 + (cast(n_corpus - df2 as double) + 0.5D)
                     / (cast(df2 as double) + 0.5D)
                     * (cast(tf2 as double) * 2.2D)
                     / (cast(tf2 as double) + 1.2D
                        * (1.0D - 0.75D + 0.75D * cast(dl as double)
                           / (cast(total_dl as double)
                              / cast(n_corpus as double))))
                   as raw
            from per_doc cross join stats),
        snapped as (
            select doc_id, dl, tf0, tf1, tf2,
                   cast(round(cast(raw as decimal(28,10)), 6)
                     as double) as score
            from scored)
        select cast(row_number() over
                    (order by score desc, doc_id) as bigint) as rank,
               doc_id, dl,
               tf0 as tf_0, tf1 as tf_1, tf2 as tf_2, score
        from snapped
        order by score desc, doc_id limit 20
    """,
    # Keep-longest survivorship twin (q156): Spark regexp_replace
    # (implicit 'g') and HOF token count, same planted clusters.
    "q156_dedup_keepers": """
        with planted as (
            select doc_id,
                   case when doc_id % 23 = 0
                        then concat('boiler plate item ',
                                    cast(doc_id % 4 as string),
                                    case when doc_id % 3 = 0
                                         then ' !! ?? ..' else '' end)
                        else text end as text
            from documents),
        per_doc as (
            select doc_id,
                   md5(trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', ''),
                       ' +', ' '))) as h,
                   cast(size(filter(split(text, ' '),
                        t -> t != '')) as bigint) as n_toks
            from planted),
        ranked as (
            select doc_id, h, n_toks,
                   cast(count(*) over (partition by h) as bigint)
                     as cluster_size,
                   row_number() over
                     (partition by h
                      order by n_toks desc, doc_id) as rn
            from per_doc)
        select doc_id, h, cluster_size, n_toks,
               cast(case when rn = 1 then 1 else 0 end as bigint)
                 as kept
        from ranked where cluster_size >= 2
        order by doc_id
    """,
    # Shingle compressibility twin (q157): Spark posexplode over the
    # same k=8 md5 windows.
    "q157_shingle_compressibility": """
        with st as (
            select source,
                   filter(split(lower(text), ' '), t -> t != '')
                     as toks
            from documents),
        sh as (
            select source,
                   explode(transform(
                       sequence(1, size(toks) - 7),
                       i -> md5(array_join(slice(toks, i, 8), ' '))))
                     as sh
            from st where size(toks) >= 8),
        per_sh as (
            select source, sh, cast(count(*) as bigint) as c
            from sh group by source, sh)
        select source,
               cast(sum(c) as bigint) as total_shingles,
               cast(count(*) as bigint) as distinct_shingles,
               cast(round(cast(
                    cast(sum(c) - count(*) as double)
                    / cast(sum(c) as double)
                    as decimal(28,10)), 6) as double)
                 as dup_shingle_ratio
        from per_sh group by source order by source
    """,
    # LM transition score (q160): Spark HOF bigram formation, same
    # rational arithmetic as the DataFrame door. The scored-relation
    # CTE chain is the SHARED fragment (sql_fragments.py) composed
    # into q160 AND q163 — edit it once, everywhere.
    "q160_lm_transition_score": LM_SCORED_CTES_SPARKSQL + """
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(n_trans) as bigint) as n_transitions,
               cast(round(cast(cast(sum(num) as double)
                    / cast(sum(den) as double)
                    as decimal(28,10)), 6) as double) as micro_score,
               cast(round(cast(min(score) as decimal(28,10)), 6)
                 as double) as min_score,
               cast(round(cast(max(score) as decimal(28,10)), 6)
                 as double) as max_score
        from scored group by source order by source
    """,
    # Gopher-rule attribution (q162): Spark HOF spellings of the four
    # exact-integer rules.
    "q162_gopher_rules": """
        with planted as (
            select source,
                   case when doc_id % 29 = 0
                        then concat('zzq', cast(doc_id % 13 as string),
                                    ' qxv wvx zzq kjq pqz mvz nbq')
                        when doc_id % 23 = 0
                        then concat(text, ' ## -- !! ##')
                        else text end as text
            from documents),
        feat as (
            select source,
                   cast(size(toks) as bigint) as n_words,
                   aggregate(toks, cast(0 as bigint),
                             (acc, t) -> acc + length(t)) as sum_len,
                   cast(size(filter(toks,
                        t -> t rlike '^[^a-z0-9]+$')) as bigint)
                     as n_symbol,
                   cast(size(array_intersect(toks,
                        array('the','a','of','and','with','that',
                              'to','be'))) as bigint) as n_stop
            from (select source,
                         filter(split(lower(text), ' '), t -> t != '')
                           as toks
                  from planted)),
        flags as (
            select source,
                   (n_words < 20 or n_words > 1000) as f_wc,
                   (sum_len < 3 * n_words
                    or sum_len > 10 * n_words) as f_ml,
                   (n_symbol * 100 > 10 * n_words) as f_sym,
                   (n_stop < 2) as f_stop
            from feat)
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(sum(case when f_wc then 1 else 0 end) as bigint)
                 as n_fail_wordcount,
               cast(sum(case when f_ml then 1 else 0 end) as bigint)
                 as n_fail_meanlen,
               cast(sum(case when f_sym then 1 else 0 end) as bigint)
                 as n_fail_symbol,
               cast(sum(case when f_stop then 1 else 0 end) as bigint)
                 as n_fail_stopword,
               cast(sum(case when f_wc or f_ml or f_sym or f_stop
                             then 1 else 0 end) as bigint)
                 as n_fail_any,
               cast(sum(case when
                    (case when f_wc then 1 else 0 end)
                    + (case when f_ml then 1 else 0 end)
                    + (case when f_sym then 1 else 0 end)
                    + (case when f_stop then 1 else 0 end) >= 2
                    then 1 else 0 end) as bigint) as n_fail_multi,
               cast(round(cast(
                    cast(sum(case when f_wc or f_ml or f_sym or f_stop
                                  then 1 else 0 end) as double)
                    / cast(count(*) as double)
                    as decimal(28,10)), 6) as double) as reject_ratio
        from flags group by source order by source
    """,
    # Selection curve (q163): q160's SHARED Spark-dialect scored
    # relation (sql_fragments.py) swept over the explode()d grid.
    "q163_selection_curve": LM_SCORED_CTES_SPARKSQL + """,
        thr as (
            select explode(array(cast(0.02 as double),
                                 cast(0.03 as double),
                                 cast(0.035 as double),
                                 cast(0.04 as double))) as thr)
        select source, thr,
               cast(count(*) as bigint) as n_docs,
               cast(sum(case when score >= thr then 1 else 0 end)
                 as bigint) as n_docs_kept,
               cast(sum(case when score >= thr then n_trans
                             else 0 end) as bigint) as n_trans_kept,
               cast(round(cast(
                    cast(sum(case when score >= thr then 1 else 0 end)
                         as double)
                    / cast(count(*) as double)
                    as decimal(28,10)), 6) as double) as kept_ratio
        from scored cross join thr
        group by source, thr order by source, thr
    """,
    # Arrival regularity (q166): unix_micros spelling of epoch_us.
    "q166_arrival_regularity": """
        with d as (
            select user_id, unix_micros(ts) as us from events),
        lagd as (
            select user_id,
                   us - lag(us) over (partition by user_id
                                      order by us) as dd
            from d),
        per_user as (
            select user_id,
                   cast(count(*) + 1 as bigint) as n_events,
                   cast(count(*) as bigint) as n_deltas,
                   cast(sum(cast(dd as decimal(19,0)))
                     as decimal(38,0)) as s,
                   cast(sum(cast(dd as decimal(19,0))
                            * cast(dd as decimal(19,0)))
                     as decimal(38,0)) as ss
            from lagd where dd is not null
            group by user_id
            having count(*) + 1 >= 5 and sum(dd) > 0
               and count(*) >= 2)
        select user_id, n_events,
               cast(round(cast(cast(s as double)
                    / cast(n_deltas as double)
                    as decimal(28,4)), 1) as double) as mean_delta_us,
               cast(round(cast(
                    cast(cast(n_deltas as decimal(38,0))
                         * (cast(n_deltas as decimal(38,0)) * ss
                            - s * s) as double)
                    / cast((cast(n_deltas as decimal(38,0)) - 1)
                           * s * s as double)
                    as decimal(28,10)), 6) as double) as cv2
        from per_user
        order by cv2 asc, user_id limit 10
    """,
    # Bounded temporal reach (q158): Spark datediff(end, start)
    # spelling of DuckDB's 3-arg date_diff('day', ...).
    "q158_temporal_reach2": """
        with base as (
            select distinct o_custkey as cust, l_suppkey as supp,
                   cast(datediff(cast(o_orderdate as date),
                                 date '1970-01-01') as double) as ts
            from orders join lineitem on o_orderkey = l_orderkey),
        edges as (
            select cust as src, supp + 1000000 as dst, ts from base
            union all
            select supp + 1000000 as src, cust as dst, ts from base),
        src as (
            select distinct o_custkey as id from orders
            where o_custkey % 200 = 0),
        h1 as (
            select e.dst as id, min(e.ts) as arr
            from edges e join src s on e.src = s.id
            group by e.dst),
        h2 as (
            select e.dst as id, min(e.ts) as arr
            from edges e join h1 on e.src = h1.id
                                and e.ts >= h1.arr
            group by e.dst),
        allh as (
            select * from h1 union all select * from h2)
        select id, cast(min(arr) as double) as arrival_day
        from allh group by id order by id
    """,
    # Multimodal asset inventory (q168): Spark spellings — binary
    # cast for payload bytes, element_at for the modality tables.
    # Asset inventory (q168): the manifest CTE is the SHARED fragment
    # (sql_fragments.py) composed into q168 AND q170; the binary cast
    # happens at the consumer (fragment carries payload_text).
    "q168_asset_profile": ASSET_MANIFEST_CTE_SPARKSQL + """,
        per_payload as (
            select modality, media_type,
                   md5(cast(payload_text as binary)) as h,
                   cast(count(*) as bigint) as c,
                   cast(sum(coalesce(octet_length(
                        cast(payload_text as binary)), 0)) as bigint)
                     as b
            from manifest
            group by modality, media_type,
                     md5(cast(payload_text as binary)))
        select modality, media_type,
               cast(sum(c) as bigint) as n_assets,
               cast(sum(b) as bigint) as total_bytes,
               cast(sum(case when h is not null then 1 else 0 end)
                 as bigint) as n_distinct_payloads,
               cast(sum(case when h is null then c else 0 end)
                 as bigint) as n_missing,
               cast(sum(case when h is not null then c else 0 end)
                    - sum(case when h is not null then 1 else 0 end)
                 as bigint) as n_removable,
               cast(round(cast(
                    cast(sum(case when h is not null then c
                             else 0 end)
                         - sum(case when h is not null then 1
                               else 0 end) as double)
                    / cast(sum(c) as double)
                    as decimal(28,10)), 6) as double) as dup_ratio
        from per_payload group by modality, media_type
        order by modality, media_type
    """,
    # Vector hygiene (q169): Spark HOF spellings; same fold order.
    # NULL vectors are their own defect class (ADVICE r12).
    "q169_vector_hygiene": """
        with planted as (
            select label,
                   case when vec_id % 17 = 0
                        then transform(cast(embedding
                             as array<double>), x -> cast(0.0
                             as double))
                        when vec_id % 23 = 0
                        then cast(slice(embedding, 1, 32)
                             as array<double>)
                        when vec_id % 29 = 0
                        then transform(cast(embedding
                             as array<double>),
                             (x, i) -> case when i = 0
                                       then cast('NaN' as double)
                                       else x end)
                        when vec_id % 31 = 0
                        then cast(NULL as array<double>)
                        else cast(embedding as array<double>) end as e
            from embeddings),
        feat as (
            select label,
                   (e is null) as f_null,
                   (e is not null and size(e) <> 64) as f_dim,
                   (e is not null
                    and size(filter(e, x -> isnan(x)
                                    or abs(x) = cast('Infinity'
                                                 as double))) > 0)
                     as f_fin,
                   aggregate(zip_with(e, e, (x, y) -> x * y),
                             cast(0.0 as double),
                             (acc, x) -> acc + x) as n2
            from planted),
        flagged as (
            select label, f_null, f_dim, f_fin,
                   (not f_null and not f_dim and not f_fin
                    and n2 = 0.0) as f_zero,
                   case when not f_null and not f_dim and not f_fin
                             and n2 > 0.0
                        then n2 end as h_n2
            from feat)
        select label,
               cast(count(*) as bigint) as n_vecs,
               cast(sum(case when f_null then 1 else 0 end)
                 as bigint) as n_null,
               cast(sum(case when f_dim then 1 else 0 end) as bigint)
                 as n_bad_dim,
               cast(sum(case when f_fin then 1 else 0 end) as bigint)
                 as n_nonfinite,
               cast(sum(case when f_zero then 1 else 0 end)
                 as bigint) as n_zero,
               cast(round(cast(min(h_n2) as decimal(28,8)), 6)
                 as double) as min_norm2,
               cast(round(cast(max(h_n2) as decimal(28,8)), 6)
                 as double) as max_norm2
        from flagged group by label order by label
    """,
    # Portable text profile (oracled r13): Spark-dialect spelling of
    # the SHARED per-doc CTE chain (sql_fragments.py).
    "text_profile": TEXT_PROFILE_CTES_SPARKSQL + """
        select doc_id, lang_detected,
               n_tokens_ws, n_tokens_bpe, quality, fingerprint
        from prof order by doc_id
    """,
    "text_quality_report": TEXT_PROFILE_CTES_SPARKSQL + """
        select source,
               cast(count(*) as bigint) as n_docs,
               cast(round(cast(avg(quality) as decimal(28,8)), 4)
                 as double) as avg_quality,
               cast(round(cast(avg(n_tokens_bpe) as decimal(28,6)), 2)
                 as double) as avg_tokens_bpe,
               cast(count(distinct lang_detected) as bigint)
                 as n_langs,
               cast(count(distinct fingerprint) as bigint)
                 as n_distinct_fp
        from prof group by source order by source
    """,
    # RA link prediction (q171): Spark `div` spelling of the exact
    # integer weight; identical bigint-sum ordering.
    "q171_resource_allocation": """
        with pairs as (
            select distinct o.o_custkey as c, l.l_suppkey as s
            from orders o join lineitem l
              on l.l_orderkey = o.o_orderkey),
        cdeg as (select c, count(*) as dz from pairs group by c),
        wp as (
            select p.c, p.s,
                   cast(1000000000000L div dz as bigint) as w
            from pairs p join cdeg on cdeg.c = p.c),
        scored as (
            select a.s as s1, b.s as s2,
                   cast(count(*) as bigint) as cn,
                   cast(sum(a.w) as bigint) as ra_w
            from wp a join wp b on a.c = b.c and a.s < b.s
            group by 1, 2)
        select s1, s2, cn,
               cast(round(cast(cast(ra_w as double)
                    / cast(1e12 as double)
                    as decimal(28,10)), 6) as double) as ra_score
        from scored
        order by ra_w desc, s1, s2
        limit 50
    """,
    # Dedup threshold curve (q172): Spark HOF shingles (with the
    # sequence(1,0)-descending guard) + explode()d grid.
    "q172_dedup_threshold_curve": """
        with sh as (
          select doc_id,
                 case when length(lower(text)) >= 3 then
                   array_distinct(transform(
                     sequence(1, length(lower(text)) - 2),
                     i -> substring(lower(text), i, 3)))
                 else cast(array() as array<string>) end as sh
          from documents),
        sz as (select doc_id, size(sh) as n from sh),
        ex as (select doc_id, explode(sh) as g from sh),
        exa as (select doc_id as src, g from ex
                where doc_id % 100 = 0),
        exb as (select doc_id as dst, g from ex
                where doc_id % 100 != 0),
        inter as (select a.src, b.dst, count(*) as i
                  from exa a join exb b on b.g = a.g
                  group by 1, 2),
        j as (select i.src, i.dst,
                     cast(i.i as double)
                     / cast(sa.n + sb.n - i.i as double) as jac
              from inter i
              join sz sa on sa.doc_id = i.src
              join sz sb on sb.doc_id = i.dst
              where least(sa.n, sb.n) * 2 >= greatest(sa.n, sb.n)),
        p as (select src, dst, jac from j where jac >= 0.5),
        g as (select explode(array(cast(0.5 as double),
                                   cast(0.6 as double),
                                   cast(0.7 as double),
                                   cast(0.8 as double),
                                   cast(0.9 as double)))
                       as threshold),
        nn as (select cast(count(*) as bigint) as n_new
               from documents where doc_id % 100 != 0)
        select threshold,
               cast(count(*) as bigint) as n_pairs,
               cast(count(distinct dst) as bigint) as n_docs_removed,
               cast(round(cast(
                    cast(count(distinct dst) as double)
                    / cast(max(n_new) as double)
                    as decimal(28,10)), 6) as double) as removal_ratio
        from p cross join g cross join nn
        where jac >= threshold
        group by threshold order by threshold
    """,
    # All-pairs Jaccard (q176): the same NAIVE inverted-index shape
    # as the DuckDB oracle, in Spark spellings — still independent of
    # the DataFrame door's prefix filter.
    "q176_allpairs_jaccard": """
        with sh as (
          select doc_id,
                 case when length(lower(text)) >= 3 then
                   array_distinct(transform(
                     sequence(1, length(lower(text)) - 2),
                     i -> substring(lower(text), i, 3)))
                 else cast(array() as array<string>) end as sh
          from documents where doc_id % 20 = 0),
        sz as (select doc_id, size(sh) as n from sh
               where size(sh) > 0),
        ex as (select doc_id, explode(sh) as g from sh),
        inter as (select x.doc_id as a, y.doc_id as b,
                         count(*) as i
                  from ex x join ex y
                    on y.g = x.g and x.doc_id < y.doc_id
                  group by 1, 2),
        j as (select t.a, t.b, t.i, sa.n + sb.n - t.i as u
              from inter t
              join sz sa on sa.doc_id = t.a
              join sz sb on sb.doc_id = t.b)
        select a, b,
               cast(round(cast(cast(i as double) / cast(u as double)
                    as decimal(28,10)), 6) as double) as jac
        from j where i * 5 >= u * 3
        order by a, b
    """,
    # Negative sampling (q177): explode()d rank grid; same bigint
    # hash arithmetic.
    "q177_negative_sampling": """
        with edges as (
            select distinct o.o_custkey as c, l.l_suppkey as s
            from orders o join lineitem l
              on l.l_orderkey = o.o_orderkey),
        ns as (select count(*) as n_supp from supplier),
        cand as (
            select c, s as s_pos, r.rank,
                   cast(1 + (s - 1 + r.rank * 2654435761)
                        % n_supp as bigint) as s_neg
            from edges cross join ns
            cross join (select explode(array(1, 2, 3)) as rank) r
            where c % 50 = 0)
        select cand.c, cand.s_pos, cand.rank, cand.s_neg,
               cast(case when e2.s is null then 0 else 1 end
                 as bigint) as is_true_edge
        from cand left join edges e2
          on e2.c = cand.c and e2.s = cand.s_neg
        order by cand.c, cand.s_pos, cand.rank
    """,
    # Source overlap (q179): Spark regexp_replace is global by
    # default; same naive self-join shape as the DuckDB oracle.
    "q179_source_overlap": """
        with planted as (
            select source,
                   case when doc_id % 7 = 0
                        then concat('shared boilerplate ',
                                    cast(doc_id % 5 as string))
                        else text end as text
            from documents),
        sh as (
            select distinct source as src,
                   md5(trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]', ''),
                       ' +', ' '))) as h
            from planted),
        per_src as (select src, count(*) as n_hashes
                    from sh group by src),
        pairs as (
            select x.src as a, y.src as b, count(*) as n_shared
            from sh x join sh y
              on y.h = x.h and x.src < y.src
            group by 1, 2)
        select a, b, cast(n_shared as bigint) as n_shared,
               cast(na.n_hashes as bigint) as n_a,
               cast(nb.n_hashes as bigint) as n_b,
               cast(round(cast(
                    cast(n_shared as double)
                    / cast(least(na.n_hashes, nb.n_hashes) as double)
                    as decimal(28,10)), 6) as double) as overlap
        from pairs
        join per_src na on na.src = pairs.a
        join per_src nb on nb.src = pairs.b
        order by a, b
    """,
    # Per-dim embedding profile (q173): posexplode ordinality in the
    # Spark dialect; same decimal sums and IEEE operand order.
    "q173_embedding_dim_profile": """
        with px as (
            select d, cast(x as double) as x
            from embeddings
            lateral view posexplode(embedding) t as d, x),
        agg as (
            select d, cast(count(*) as bigint) as n,
                   cast(sum(cast(x as decimal(28,12))) as double)
                     as sx,
                   cast(sum(cast(x * x as decimal(28,16))) as double)
                     as sxx,
                   min(x) as vmin_raw, max(x) as vmax_raw
            from px group by d)
        select cast(d as int) as dim, n,
               cast(round(cast(sx / cast(n as double)
                    as decimal(28,10)), 6) as double) as mean,
               cast(round(cast(
                    (sxx - sx * sx / cast(n as double))
                    / cast(n as double)
                    as decimal(28,12)), 8) as double) as var,
               cast(round(cast(vmin_raw as decimal(28,10)), 6)
                 as double) as vmin,
               cast(round(cast(vmax_raw as decimal(28,10)), 6)
                 as double) as vmax,
               cast(round(cast(
                    (vmax_raw - vmin_raw) / cast(255.0 as double)
                    as decimal(28,12)), 8) as double) as int8_scale
        from agg order by dim
    """,
    # Payload dedup (q170): shared manifest fragment; the window key
    # is (modality, md5) exactly as the DataFrame door.
    "q170_payload_dedup": ASSET_MANIFEST_CTE_SPARKSQL + """,
        h as (
            select asset_id, modality,
                   md5(cast(payload_text as binary)) as payload_hash
            from manifest)
        select asset_id, modality, payload_hash,
               cast(case when payload_hash is not null
                    then count(*) over (partition by modality,
                                        payload_hash)
                    else 0 end as bigint) as cluster_size,
               cast(case when payload_hash is not null
                         and asset_id = min(asset_id)
                             over (partition by modality,
                                   payload_hash)
                    then 1 else 0 end as bigint) as is_keeper
        from h order by asset_id
    """,
}
