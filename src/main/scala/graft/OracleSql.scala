package graft

/** DuckDB oracle SQL for the driver's independent correctness compare.
  *
  * `decisions(txDir)` re-derives the FULL message decision — tidy, JSON
  * envelope parse, fixture-JWT base64 decode, the three dimension joins,
  * regex/ABN/Luhn validation and the abort/last-answer-wins fold — in pure
  * DuckDB SQL over the same parquet fixtures the Spark queries read.
  * Verified to agree with the engine on every row of the sf0.01 corpus.
  *
  * Caveats (documented divergences, impossible in fixture data):
  *  - values like "+1…" that are non-numeric yet Integer.parseInt-able
  *    would checksum in the reference but abort here;
  *  - regexes beyond RE2 (backrefs/lookaround) differ between Java regex
  *    (engine) and DuckDB's RE2 (oracle). Fixture regexes are RE2-safe.
  */
object OracleSql {

  def decisions(txDir: String): String = s"""
WITH tx AS (
  SELECT conv_id, turn_idx, role,
         replace(text, 'Adamm', 'Adam') AS text
  FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
  WHERE text IS NOT NULL
),
txj AS (
  SELECT *, CASE WHEN json_valid(text) THEN text END AS j FROM tx
),
env AS (
  SELECT conv_id, turn_idx, role, text,
    json_extract_string(j,'$$.msg_type') AS msg_type,
    json_extract_string(j,'$$.data_type') AS data_type,
    json_extract_string(j,'$$.token') AS token,
    CASE WHEN json_extract(j,'$$.items') IS NOT NULL
              AND json_type(json_extract(j,'$$.items')) = 'ARRAY'
         THEN from_json(json_extract(j,'$$.items'),
              '[{"sourceCode":"VARCHAR","targetCode":"VARCHAR","attributeCode":"VARCHAR","value":"VARCHAR"}]')
    END AS items,
    (j IS NOT NULL AND json_extract_string(j,'$$.msg_type') IS NOT NULL
       AND json_extract_string(j,'$$.data_type') IS NOT NULL) AS wellformed
  FROM txj
),
claims AS (
  SELECT *,
    CASE WHEN token IS NOT NULL AND len(string_split(token,'.')) = 3
              AND regexp_full_match(split_part(token,'.',2), '[A-Za-z0-9_-]+')
         THEN decode(from_base64(
                replace(replace(split_part(token,'.',2),'-','+'),'_','/') ||
                repeat('=', (4 - length(split_part(token,'.',2)) % 4) % 4)))
    END AS payload
  FROM env
),
msgs AS (
  SELECT conv_id, turn_idx, role, text, msg_type, data_type, token, items,
    CASE WHEN payload IS NOT NULL AND json_valid(payload)
              AND json_extract_string(payload,'$$.sub') IS NOT NULL
              AND json_extract_string(payload,'$$.userCode') IS NOT NULL
         THEN json_extract_string(payload,'$$.sub') END AS uuid,
    CASE WHEN payload IS NOT NULL AND json_valid(payload)
              AND json_extract_string(payload,'$$.sub') IS NOT NULL
              AND json_extract_string(payload,'$$.userCode') IS NOT NULL
         THEN json_extract_string(payload,'$$.userCode') END AS user_code,
    CASE
      WHEN NOT wellformed THEN 'MALFORMED_NOUUID'
      WHEN msg_type != 'DATA_MSG' OR data_type != 'Answer' THEN 'PASS'
      WHEN token IS NULL THEN 'MALFORMED_NOUUID'
      WHEN payload IS NULL OR NOT json_valid(payload)
           OR json_extract_string(payload,'$$.sub') IS NULL
           OR json_extract_string(payload,'$$.userCode') IS NULL THEN 'MALFORMED_NOUUID'
      WHEN items IS NULL THEN 'MALFORMED_UUID'
      ELSE 'FOLD'
    END AS klass
  FROM claims
),
answers AS (
  SELECT conv_id, turn_idx, user_code, uuid,
         unnest(generate_series(1, len(items))) AS pos, items
  FROM msgs WHERE klass = 'FOLD'
),
astep AS (
  SELECT a.conv_id, a.turn_idx, a.pos,
    a.items[a.pos] AS ans,
    a.user_code,
    se.code AS se_code, te.code AS te_code, te.name AS te_name,
    de.target_code AS de_code, de.allowed,
    at.attribute_code AS at_code, at.validations
  FROM answers a
  LEFT JOIN read_parquet('$txDir/entities.parquet/*.parquet') se
    ON a.items[a.pos].sourceCode = se.code
  LEFT JOIN read_parquet('$txDir/entities.parquet/*.parquet') te
    ON a.items[a.pos].targetCode = te.code
  LEFT JOIN read_parquet('$txDir/def_allowed.parquet/*.parquet') de
    ON a.items[a.pos].targetCode = de.target_code
  LEFT JOIN read_parquet('$txDir/attribute_defs.parquet/*.parquet') at
    ON a.items[a.pos].attributeCode = at.attribute_code
),
stepped AS (
  SELECT conv_id, turn_idx, pos,
    CASE
      WHEN ans.sourceCode IS NULL OR user_code != ans.sourceCode
        THEN struct_pack(kind := 'C', ok := false, reason := 'SOURCE_NOT_USER')
      WHEN se_code IS NULL THEN struct_pack(kind := 'A', ok := false, reason := 'SOURCE_MISSING')
      WHEN te_code IS NULL THEN struct_pack(kind := 'C', ok := false, reason := 'TARGET_MISSING')
      WHEN de_code IS NULL THEN struct_pack(kind := 'A', ok := false, reason := 'DEF_MISSING')
      WHEN NOT list_contains(allowed, 'ATT_' || coalesce(ans.attributeCode, 'null'))
        THEN struct_pack(kind := 'C', ok := false, reason := 'ATT_NOT_ALLOWED')
      WHEN at_code IS NULL THEN struct_pack(kind := 'C', ok := false, reason := 'ATT_UNKNOWN')
      WHEN ans.attributeCode = 'PRI_ABN' THEN
        CASE
          WHEN ans.value IS NULL OR NOT regexp_full_match(ans.value, '[0-9]+')
            THEN struct_pack(kind := 'A', ok := false, reason := 'ABN_FAIL')
          WHEN length(ans.value) != 11
            THEN struct_pack(kind := 'C', ok := false, reason := 'ABN_FAIL')
          WHEN (list_sum(list_transform(generate_series(1, 11), i ->
                 CAST(ans.value[i] AS INT) *
                 ([10,1,3,5,7,9,11,13,15,17,19])[i])) - 10) % 89 = 0
            THEN struct_pack(kind := 'C', ok := true, reason := NULL)
          ELSE struct_pack(kind := 'C', ok := false, reason := 'ABN_FAIL')
        END
      WHEN ans.attributeCode = 'PRI_CREDITCARD' THEN
        CASE
          WHEN ans.value IS NULL THEN struct_pack(kind := 'A', ok := false, reason := 'LUHN_FAIL')
          WHEN length(ans.value) = 0 THEN struct_pack(kind := 'C', ok := true, reason := NULL)
          WHEN NOT regexp_full_match(ans.value, '[0-9]+')
            THEN struct_pack(kind := 'A', ok := false, reason := 'LUHN_FAIL')
          WHEN list_sum(list_transform(generate_series(1, length(ans.value)), j ->
                 CASE WHEN j % 2 = 0 THEN
                   CASE WHEN 2*CAST(ans.value[length(ans.value)-j+1] AS INT) > 9
                        THEN 2*CAST(ans.value[length(ans.value)-j+1] AS INT) % 10 + 1
                        ELSE 2*CAST(ans.value[length(ans.value)-j+1] AS INT) END
                 ELSE CAST(ans.value[length(ans.value)-j+1] AS INT) END)) % 10 = 0
            THEN struct_pack(kind := 'C', ok := true, reason := NULL)
          ELSE struct_pack(kind := 'C', ok := false, reason := 'LUHN_FAIL')
        END
      WHEN ans.value IS NULL THEN struct_pack(kind := 'A', ok := false, reason := 'REGEX_FAIL')
      WHEN len(list_filter(validations, v -> regexp_full_match(ans.value, v.regex))) > 0
        THEN struct_pack(kind := 'C', ok := true, reason := NULL)
      ELSE struct_pack(kind := 'C', ok := false, reason := 'REGEX_FAIL')
    END AS step
  FROM astep
),
fold AS (
  SELECT conv_id, turn_idx,
    min(pos) FILTER (WHERE step.kind = 'A') AS abort_pos,
    arg_min(step.reason, pos) FILTER (WHERE step.kind = 'A') AS abort_reason,
    arg_max(struct_pack(ok := step.ok, reason := step.reason), pos) AS last
  FROM stepped
  GROUP BY conv_id, turn_idx
)
SELECT m.conv_id, m.turn_idx, m.role,
  CASE
    WHEN m.klass = 'PASS' THEN 'valid'
    WHEN m.klass IN ('MALFORMED_NOUUID','MALFORMED_UUID') THEN 'rejected'
    WHEN f.conv_id IS NULL THEN 'valid'
    WHEN f.abort_pos IS NOT NULL THEN 'rejected'
    WHEN f.last.ok THEN 'valid' ELSE 'rejected'
  END AS decision,
  CASE
    WHEN m.klass = 'PASS' THEN NULL
    WHEN m.klass IN ('MALFORMED_NOUUID','MALFORMED_UUID') THEN 'MALFORMED'
    WHEN f.conv_id IS NULL THEN NULL
    WHEN f.abort_pos IS NOT NULL THEN f.abort_reason
    WHEN f.last.ok THEN NULL ELSE f.last.reason
  END AS reason,
  CASE
    WHEN m.klass = 'MALFORMED_UUID' THEN m.uuid
    WHEN m.klass = 'FOLD' AND f.conv_id IS NOT NULL AND
         (f.abort_pos IS NOT NULL OR NOT f.last.ok) THEN m.uuid
  END AS uuid
FROM msgs m LEFT JOIN fold f USING (conv_id, turn_idx)
ORDER BY conv_id, turn_idx"""

  /** Batch dedup: duplicate-injected input (every turn_idx=0 row twice),
    * first-wins by (ts, role). Mirrors DedupState.dedupBatch.
    */
  def dedup(txDir: String): String = s"""
WITH src AS (
  SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
),
dup AS (
  SELECT * FROM src
  UNION ALL
  SELECT * FROM src WHERE turn_idx = 0
)
SELECT conv_id, turn_idx, role, text, tool, ts FROM (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx
      ORDER BY ts ASC NULLS LAST, role ASC) AS rn
  FROM dup
) WHERE rn = 1
ORDER BY conv_id, turn_idx"""

  /** Gaps-and-islands reproduction of Spark's session_window(ts, gap):
    * a new session starts when the gap to the previous event is >= `gap`;
    * session_end = last event + gap.
    */
  def sessionize(txDir: String, gapMinutes: Int): String = s"""
WITH t AS (
  SELECT conv_id, role, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY conv_id ORDER BY ts)
              >= INTERVAL $gapMinutes MINUTE
         OR lag(ts) OVER (PARTITION BY conv_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
),
isl AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY conv_id ORDER BY ts
    ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t
)
SELECT conv_id,
  min(ts) AS session_start,
  max(ts) + INTERVAL $gapMinutes MINUTE AS session_end,
  count(*) AS n_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
  CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT) AS n_tool,
  min(ts) AS ts_first,
  max(ts) AS ts_last
FROM isl
GROUP BY conv_id, sess_id
ORDER BY conv_id, session_start"""

  /** Interval join of user turns to following tool turns (TurnJoin). */
  def turnJoin(txDir: String, horizonMinutes: Int): String = s"""
WITH src AS (
  SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
)
SELECT u.conv_id AS conv_id, u.turn_idx AS u_turn_idx,
       t.turn_idx AS t_turn_idx, u.ts AS u_ts, t.ts AS t_ts,
       t.tool AS tool
FROM src u JOIN src t
  ON u.conv_id = t.conv_id
 AND u.role = 'user' AND t.role = 'tool'
 AND t.ts >= u.ts AND t.ts <= u.ts + INTERVAL $horizonMinutes MINUTE
 AND t.turn_idx > u.turn_idx
ORDER BY conv_id, u_turn_idx, t_turn_idx"""

  /** Left-outer variant: every user turn appears; unanswered ones carry
    * nulls on the tool side (streaming form emits those rows once the
    * watermark passes u_ts + horizon).
    */
  def turnJoinOuter(txDir: String, horizonMinutes: Int): String = s"""
WITH src AS (
  SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
)
SELECT u.conv_id AS conv_id, u.turn_idx AS u_turn_idx,
       t.turn_idx AS t_turn_idx, u.ts AS u_ts, t.ts AS t_ts,
       t.tool AS tool
FROM (SELECT * FROM src WHERE role = 'user') u
LEFT JOIN (SELECT * FROM src WHERE role = 'tool') t
  ON u.conv_id = t.conv_id
 AND t.ts >= u.ts AND t.ts <= u.ts + INTERVAL $horizonMinutes MINUTE
 AND t.turn_idx > u.turn_idx
ORDER BY conv_id, u_turn_idx, t_turn_idx"""

  /** Webdata side-output rows (S4, TP:212-227): emitted at the
    * reached-attribute point for LNK_PERSON x BKT_APPLICATIONS x "[]",
    * suppressed for answers after an earlier-answer abort (quirk Q9/Q2).
    * Replays the decisions CTE chain up to the per-answer stage.
    */
  def webdata(txDir: String): String = {
    val base = decisions(txDir)
    // reuse everything up to `stepped`, then select the emit rows
    val upToStepped = base.substring(0, base.indexOf("\nfold AS ("))
    s"""$upToStepped
fold AS (
  SELECT conv_id, turn_idx,
    min(pos) FILTER (WHERE step.kind = 'A') AS abort_pos
  FROM stepped GROUP BY conv_id, turn_idx
),
reach AS (
  SELECT a.conv_id, a.turn_idx, a.pos, a.ans, a.te_name, m.token
  FROM astep a
  JOIN msgs m USING (conv_id, turn_idx)
  WHERE a.ans.sourceCode IS NOT NULL AND a.user_code = a.ans.sourceCode
    AND a.se_code IS NOT NULL AND a.te_code IS NOT NULL
    AND a.de_code IS NOT NULL
    AND list_contains(a.allowed, 'ATT_' || coalesce(a.ans.attributeCode, 'null'))
    AND a.at_code IS NOT NULL
    AND a.ans.attributeCode = 'LNK_PERSON'
    AND a.ans.targetCode = 'BKT_APPLICATIONS'
    AND a.ans.value = '[]'
)
SELECT r.conv_id, r.turn_idx,
  '{"data_type":"BaseEntity","items":[{"code":"' || r.ans.targetCode ||
  '","name":"' || r.te_name || '","LNK_PERSON":"[]"}],"total":1,"returnCount":1,"token":"'
  || r.token || '"}' AS payload
FROM reach r LEFT JOIN fold f ON r.conv_id = f.conv_id AND r.turn_idx = f.turn_idx
WHERE f.abort_pos IS NULL OR r.pos <= f.abort_pos
ORDER BY r.conv_id, r.turn_idx, payload"""
  }

  /** Salted two-phase agg must equal the naive GROUP BY — same answer,
    * different exchange shape.
    */
  def convStats(txDir: String): String = s"""
SELECT conv_id,
  count(*) AS n_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user,
  min(ts) AS ts_first, max(ts) AS ts_last
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY conv_id ORDER BY conv_id"""

  def rollupStats(txDir: String): String = s"""
SELECT role, text IS NOT NULL AS has_text, count(*) AS n
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY ROLLUP(role, has_text)
ORDER BY role NULLS FIRST, has_text NULLS FIRST, n"""

  /** Exact quantiles re-derived (quantile_cont = Spark's `percentile`
    * interpolation); the approx columns arrive pre-reduced to boolean
    * bound claims, asserted true.
    */
  def quantileApprox(txDir: String): String = s"""
SELECT role,
  quantile_cont(length(text), 0.5) AS p50_exact,
  quantile_cont(length(text), 0.9) AS p90_exact,
  CAST(max(length(text)) - min(length(text)) AS BIGINT) AS range,
  TRUE AS p50_ok,
  TRUE AS p90_ok
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
WHERE text IS NOT NULL
GROUP BY role ORDER BY role"""

  /** CEP `searchRuns` (maximal runs of >=2 clean user→agent→search-tool
    * triples) re-derived RELATIONALLY — gaps-and-islands over aligned
    * 3-turn blocks — instead of the engine's symbol-string regex
    * automaton. Two independent formulations agreeing row-for-row is the
    * point: roles cycle with turn_idx % 3 in this corpus, so every `uas`
    * triple the regex can match is block-aligned, making the island form
    * exact. Timestamps of the first/last matched turn come via
    * arg_min/arg_max on block index (NOT min/max of ts: late turns carry
    * pulled-back timestamps, and ordering is by turn_idx).
    */
  def cepMatches(txDir: String): String = s"""
WITH sym AS (
  SELECT conv_id, turn_idx,
    coalesce(CAST(epoch(ts) AS BIGINT), 0) AS ts_sec,
    CASE WHEN role = 'user' AND text LIKE 'garbage%' THEN 'g'
         WHEN role = 'user' AND text IS NOT NULL THEN 'u'
         WHEN text IS NULL THEN 'n'
         WHEN role = 'agent' THEN 'a'
         WHEN role = 'tool' AND tool = 'search' THEN 's'
         WHEN role = 'tool' THEN 'c'
         ELSE '_' END AS s
  FROM read_parquet('$txDir/transcripts.parquet/*.parquet')),
blocks AS (
  SELECT conv_id, turn_idx // 3 AS b, count(*) AS nt,
    max(CASE WHEN turn_idx % 3 = 0 THEN s END) AS s0,
    max(CASE WHEN turn_idx % 3 = 1 THEN s END) AS s1,
    max(CASE WHEN turn_idx % 3 = 2 THEN s END) AS s2,
    min(turn_idx) AS lo, max(turn_idx) AS hi,
    min(CASE WHEN turn_idx % 3 = 0 THEN ts_sec END) AS ts_lo,
    max(CASE WHEN turn_idx % 3 = 2 THEN ts_sec END) AS ts_hi
  FROM sym GROUP BY 1, 2),
ok AS (
  SELECT * FROM blocks
  WHERE nt = 3 AND s0 = 'u' AND s1 = 'a' AND s2 = 's'),
isl AS (
  SELECT *, b - row_number() OVER (PARTITION BY conv_id ORDER BY b) AS grp
  FROM ok),
runs AS (
  SELECT conv_id, count(*) AS n_blocks,
    min(lo) AS start_turn_idx, max(hi) AS end_turn_idx,
    arg_min(ts_lo, b) AS ts_first, arg_max(ts_hi, b) AS ts_last
  FROM isl GROUP BY conv_id, grp
  HAVING count(*) >= 2)
SELECT conv_id,
  row_number() OVER (PARTITION BY conv_id ORDER BY start_turn_idx) AS match_seq,
  start_turn_idx, end_turn_idx,
  3 * n_blocks AS n_turns,
  repeat('uas', CAST(n_blocks AS INT)) AS symbols,
  ts_last - ts_first AS span_seconds
FROM runs
ORDER BY conv_id, match_seq"""

  def toolSeq(txDir: String): String = s"""
SELECT conv_id, count(*) AS n_calls,
  string_agg(tool, ',' ORDER BY turn_idx) AS tool_seq
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
WHERE tool IS NOT NULL
GROUP BY conv_id ORDER BY conv_id"""

  def groupingSetsStats(txDir: String): String = s"""
SELECT role, tool, count(*) AS n
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY GROUPING SETS ((role), (tool), ())
ORDER BY role NULLS FIRST, tool NULLS FIRST, n"""

  def turnLatency(txDir: String): String = s"""
SELECT conv_id, turn_idx,
  CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) AS latency_sec
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
ORDER BY conv_id, turn_idx"""

  def rollingStats(txDir: String): String = s"""
SELECT conv_id, turn_idx, len,
  avg(len) OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_avg_len
FROM (SELECT conv_id, turn_idx, length(text) AS len
      FROM read_parquet('$txDir/transcripts.parquet/*.parquet'))
ORDER BY conv_id, turn_idx"""

  def topkConvs(txDir: String, k: Int): String = s"""
WITH c AS (
  SELECT conv_id, count(*) AS n_turns
  FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
  GROUP BY conv_id
)
SELECT conv_id, n_turns, rank FROM (
  SELECT *, rank() OVER (ORDER BY n_turns DESC, conv_id ASC) AS rank FROM c
) WHERE rank <= $k
ORDER BY rank, conv_id"""

  /** Tumbling windows: DuckDB time_bucket and Spark window() both align
    * buckets to day-divisor boundaries, so 5-minute edges coincide.
    */
  def tumbling(txDir: String): String = s"""
WITH t AS (SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')),
s AS (SELECT role, ts, time_bucket(INTERVAL '5 minutes', ts) AS w FROM t)
SELECT w AS window_start, w + INTERVAL 5 MINUTE AS window_end, role,
  count(*) AS n_turns
FROM s GROUP BY 1, 2, 3
ORDER BY window_start, role"""

  /** Sliding windows (10 min / 5 min): each event expands to size/slide
    * overlapping epoch-aligned windows via the generate_series offsets.
    */
  def sliding(txDir: String): String = s"""
WITH t AS (SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')),
s AS (SELECT role, ts,
  time_bucket(INTERVAL '5 minutes', ts)
    - unnest(generate_series(0, 1)) * INTERVAL 5 MINUTE AS w
FROM t)
SELECT w AS window_start, w + INTERVAL 10 MINUTE AS window_end,
  count(*) AS n_turns,
  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT) AS n_user
FROM s GROUP BY 1, 2
ORDER BY window_start"""

  def cardinality(txDir: String): String = s"""
SELECT role, count(*) AS n, count(DISTINCT conv_id) AS n_convs
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY role ORDER BY role"""

  // --------------------------------------------------------------------
  // Training-data pipeline ops over the driver's documents/embeddings
  // tables (referenced by bare table name — the driver registers them).
  // --------------------------------------------------------------------

  /** Exact dedup over documents + planted exact copies (doc_id+200000). */
  val dedupExact: String = """
WITH input AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 20
),
h AS (
  SELECT doc_id,
    md5(trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS text_hash
  FROM input
)
SELECT doc_id, text_hash,
  min(doc_id) OVER (PARTITION BY text_hash) AS keep_id,
  doc_id = min(doc_id) OVER (PARTITION BY text_hash) AS keep
FROM h
ORDER BY doc_id"""

  /** Natural 3-gram Jaccard pairs over documents at threshold 0.05,
    * mirroring the engine's maxDf=1000 document-frequency prune (shared
    * counts AND set sizes both over the pruned shingle space, so the
    * oracle stays exact at any corpus size).
    */
  val ngramJaccard: String = """
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(ws) - 2, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
ex0 AS (SELECT doc_id, unnest(s) AS sh FROM sh),
keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 1000),
ex AS (SELECT ex0.* FROM ex0 SEMI JOIN keep USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, shared, sa.n AS na, sb.n AS nb,
  CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.05
ORDER BY doc_a, doc_b"""

  /** Benchmark decontamination: word-8-gram overlap of the md5-'train'
    * bucket against the md5-'val' holdout, with planted leaks (full
    * copies of docs 20..40 at +400000; 12-word prefixes of val docs
    * 59/63 at +410000). Split, gram extraction, holdout set, and both
    * counts are all independently re-derived — no {OUT} echo.
    */
  val decontam: String = """
WITH input AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000 AS doc_id, text FROM documents
  WHERE doc_id BETWEEN 20 AND 40
  UNION ALL
  SELECT doc_id + 410000 AS doc_id,
    array_to_string((string_split_regex(lower(trim(text)), '\s+'))[1:12], ' ') AS text
  FROM documents WHERE doc_id IN (59, 63)
),
s AS (
  SELECT doc_id, text,
    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
         THEN 'val' ELSE 'train' END AS split
  FROM input),
g AS (
  SELECT doc_id, split, unnest(list_distinct(list_transform(
    generate_series(1, greatest(len(ws) - 7, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
         ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' || ws[i+7]))) AS g
  FROM (SELECT doc_id, split,
          string_split_regex(lower(trim(text)), '\s+') AS ws FROM s)),
hold AS (SELECT DISTINCT g FROM g WHERE split = 'val'),
tr AS (SELECT doc_id, g FROM g WHERE split = 'train'),
sizes AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY 1),
shared AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM tr SEMI JOIN hold USING (g) GROUP BY 1)
SELECT s.doc_id,
  coalesce(sizes.n_grams, 0) AS n_grams,
  coalesce(shared.n_contaminated, 0) AS n_contaminated,
  coalesce(shared.n_contaminated, 0) > 0 AS contaminated
FROM s LEFT JOIN sizes USING (doc_id) LEFT JOIN shared USING (doc_id)
WHERE s.split = 'train'
ORDER BY doc_id"""

  /** Trained logistic-regression quality classifier: the ENTIRE
    * full-batch-GD chain re-derived — three iterations unrolled as
    * chained aggregate CTEs (standard SQL forbids aggregates in a
    * recursive member, and a fixed iteration count unrolls exactly).
    * Iteration 1 uses the literal 0.5 because sigma(0) = 1/2 exactly in
    * both engines; double sum-order noise across engines is ~1e-15 and
    * the driver's hash rounds at 1e-9.
    */
  val qualityClassifier: String = """
WITH f AS (
  SELECT doc_id, CAST(lang = 'en' AS DOUBLE) AS y,
    1.0 AS x0,
    length(text) / 1000.0 AS x1,
    len(ws) / 100.0 AS x2,
    CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS DOUBLE)
      / greatest(len(ws), 1) / 10.0 AS x3
  FROM (SELECT doc_id, lang, text,
          string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents)),
g1 AS (
  SELECT avg((0.5 - y) * x0) AS g0, avg((0.5 - y) * x1) AS g1,
         avg((0.5 - y) * x2) AS g2, avg((0.5 - y) * x3) AS g3 FROM f),
w1 AS (
  SELECT -0.5 * g0 AS w0, -0.5 * g1 AS w1, -0.5 * g2 AS w2, -0.5 * g3 AS w3
  FROM g1),
g2 AS (
  SELECT
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x0) AS g0,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x1) AS g1,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x2) AS g2,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x3) AS g3
  FROM f CROSS JOIN w1 w),
w2 AS (
  SELECT w.w0 - 0.5*g.g0 AS w0, w.w1 - 0.5*g.g1 AS w1,
         w.w2 - 0.5*g.g2 AS w2, w.w3 - 0.5*g.g3 AS w3
  FROM w1 w CROSS JOIN g2 g),
g3 AS (
  SELECT
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x0) AS g0,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x1) AS g1,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x2) AS g2,
    avg((1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) - y) * x3) AS g3
  FROM f CROSS JOIN w2 w),
w3 AS (
  SELECT w.w0 - 0.5*g.g0 AS w0, w.w1 - 0.5*g.g1 AS w1,
         w.w2 - 0.5*g.g2 AS w2, w.w3 - 0.5*g.g3 AS w3
  FROM w2 w CROSS JOIN g3 g)
SELECT f.doc_id, f.y,
  1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) AS p,
  1.0/(1.0 + exp(-(w.w0*x0 + w.w1*x1 + w.w2*x2 + w.w3*x3))) >= 0.5 AS pred
FROM f CROSS JOIN w3 w
ORDER BY doc_id"""

  /** C4-style line dedup: planted boilerplate (one shared line per doc,
    * an extra one on every 5th), keeper = (doc_id, pos)-smallest
    * occurrence of each distinct line. The engine picks keepers with a
    * hash-agg min(struct); this oracle uses a row_number window — the
    * independent-formulation pattern. string_agg skips the NULLed
    * dropped lines exactly as collect_list skips nulls.
    */
  val lineDedup: String = """
WITH input AS (
  SELECT doc_id,
    text || chr(10) || 'subscribe to our newsletter today' ||
    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'follow us on social media'
         ELSE '' END AS text
  FROM documents),
l AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(parts)),
      i -> struct_pack(pos := i - 1, line := parts[i]))) AS pl
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM input)),
l2 AS (SELECT doc_id, CAST(pl.pos AS INT) AS pos, pl.line AS line FROM l),
k AS (
  SELECT *,
    row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) = 1 AS keep
  FROM l2)
SELECT doc_id,
  count(*) AS n_lines,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos),
    '') AS clean_text
FROM k GROUP BY doc_id ORDER BY doc_id"""

  /** PII scan: literal same RE2-compatible patterns as the engine, Luhn
    * re-derived in SQL (same form as the decisions oracle), counts on raw
    * text per lane, redaction chain email → card → ip → phone with the
    * 'g' flag (DuckDB replaces first-only by default; Spark replaces
    * all). Planted rows: doc_id % 7 == 0 carries one of each lane with a
    * Luhn-VALID card; % 7 == 1 carries a Luhn-INVALID card (n_cards must
    * stay 0 — counting it means the Luhn filter is gone).
    */
  val piiScan: String = """
WITH input AS (
  SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN
      text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      '@example.org or call 0412345678 from host 10.0.' ||
      CAST(doc_id % 250 AS VARCHAR) || '.7 card 4242424242424242 ok'
    WHEN doc_id % 7 = 1 THEN
      text || ' invalid card 4242424242424243 here'
    ELSE text END AS text
  FROM documents)
SELECT doc_id,
  CAST(coalesce(len(regexp_extract_all(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')), 0) AS BIGINT) AS n_emails,
  CAST(coalesce(len(regexp_extract_all(text, '\b04[0-9]{8}\b')), 0) AS BIGINT) AS n_phones,
  CAST(coalesce(len(regexp_extract_all(text,
    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')), 0) AS BIGINT) AS n_ips,
  CAST(coalesce(len(list_filter(regexp_extract_all(text, '\b[0-9]{13,19}\b'),
    c -> list_sum(list_transform(generate_series(1, length(c)), j ->
           CASE WHEN j % 2 = 0 THEN
             CASE WHEN 2*CAST(c[length(c)-j+1] AS INT) > 9
                  THEN 2*CAST(c[length(c)-j+1] AS INT) % 10 + 1
                  ELSE 2*CAST(c[length(c)-j+1] AS INT) END
           ELSE CAST(c[length(c)-j+1] AS INT) END)) % 10 = 0)), 0) AS BIGINT) AS n_cards,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
    '\b[0-9]{13,19}\b', '<CARD>', 'g'),
    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
    '\b04[0-9]{8}\b', '<PHONE>', 'g') AS redacted
FROM input ORDER BY doc_id"""

  /** Near-dup clustering: n-gram Jaccard pairs (threshold 0.05, planted
    * bridge docs 300000+k = text(2k) ++ text(2k+1)) collapsed to connected
    * components via a recursive min-label reachability CTE — cluster_id =
    * the smallest doc_id each node can reach, the exact definition the
    * engine's large-star/small-star implementation computes.
    */
  val dedupClusters: String = """
WITH RECURSIVE input AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT a.doc_id // 2 + 300000 AS doc_id, a.text || ' ' || b.text AS text
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id < 20 AND a.doc_id % 2 = 0
),
w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM input
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(ws) - 2, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
ex0 AS (SELECT doc_id, unnest(s) AS sh FROM sh),
keep AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 1000),
ex AS (SELECT ex0.* FROM ex0 SEMI JOIN keep USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pj AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.05
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pj
  UNION ALL
  SELECT doc_b, doc_a FROM pj
),
reach(node, lab) AS (
  SELECT doc_id, doc_id FROM input
  UNION
  SELECT e.v, r.lab FROM reach r JOIN edges e ON r.node = e.u
)
SELECT node AS doc_id, min(lab) AS cluster_id, min(lab) = node AS keep
FROM reach GROUP BY node ORDER BY doc_id"""

  /** Repetition signals — the engine's narrow run-length fold equals this
    * explode+group formulation (equal grams are adjacent once sorted, so
    * run lengths ARE the group counts).
    */
  val repSignals: String = """
WITH w AS (
  SELECT doc_id, length(text) AS n_chars_text,
    string_split_regex(lower(trim(text)), '\s+') AS ws
  FROM documents
),
g2 AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(ws) - 1, 0)),
    i -> ws[i] || ' ' || ws[i+1])) AS g
  FROM w
),
c2 AS (
  SELECT doc_id, max(c * length(g)) AS best2
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, unnest(list_transform(
    generate_series(1, greatest(len(ws) - 2, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g
  FROM w
),
c3 AS (
  SELECT doc_id, sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS dup3
  FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY doc_id
)
SELECT w.doc_id, CAST(w.n_chars_text AS DOUBLE) AS n_chars_text,
  CAST(coalesce(best2, 0) AS DOUBLE) / w.n_chars_text AS top2_frac,
  CAST(coalesce(dup3, 0) AS DOUBLE) / w.n_chars_text AS dup3_frac
FROM w LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
ORDER BY doc_id"""

  private val allStop: String =
    graft.ops.TextMetrics.stopwords.flatMap(_._2).map(w => s"'$w'").mkString("[", ",", "]")

  /** Quality metrics — identical arithmetic/order to TextMetrics.quality. */
  val textQuality: String = s"""
WITH w AS (
  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
),
m AS (
  SELECT doc_id,
    CAST(length(text) AS DOUBLE) AS n_chars_text,
    CAST(len(ws) AS DOUBLE) AS n_words,
    CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct,
    CAST(len(list_filter(ws, x -> list_contains($allStop, x))) AS DOUBLE) AS stop_hits,
    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(len(ws) AS DOUBLE) AS mean_word_len
  FROM w
)
SELECT doc_id, n_chars_text, n_words,
  punct / n_chars_text AS punct_ratio,
  stop_hits / n_words AS stopword_ratio,
  mean_word_len,
  least(n_words / 50.0, 1.0) * 0.4
    + (1.0 - least(punct / n_chars_text * 5.0, 1.0)) * 0.2
    + least(stop_hits / n_words * 5.0, 1.0) * 0.2
    + (CASE WHEN mean_word_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END) * 0.2
    AS quality_score
FROM m ORDER BY doc_id"""

  val tokenCounts: String = """
SELECT doc_id,
  len(string_split_regex(lower(trim(text)), '\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS bpe_ish_tokens
FROM documents ORDER BY doc_id"""

  /** Gopher ruleset — identical arithmetic to GopherRules.flags: counts
    * via replace-subtraction and list HOFs, every flag integer-exact.
    */
  val gopherRules: String = {
    val req = graft.ops.GopherRules.requiredStopwords
      .map(w => s"'$w'").mkString("[", ",", "]")
    val (minW, maxW) = (50, 100000)
    s"""
WITH b AS (
  SELECT doc_id, text,
    lower(trim(text)) AS lt,
    string_split_regex(lower(trim(text)), '\\s+') AS ws,
    string_split(text, chr(10)) AS lines
  FROM documents),
m AS (
  SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(greatest(len(ws), 1) AS DOUBLE) AS nw,
    CAST(length(regexp_replace(lt, '\\s+', '', 'g')) AS DOUBLE)
      / greatest(len(ws), 1) AS mean_word_len,
    CAST((length(text) - length(replace(text, '#', ''))) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT)
      AS symbols,
    CAST(greatest(len(lines), 1) AS DOUBLE) AS nl,
    len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
      OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•'))) AS bullets,
    len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS ellipses,
    len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
    len(list_intersect(list_distinct(ws), $req)) AS stop_hits
  FROM b),
f AS (
  SELECT doc_id, n_words,
    n_words BETWEEN $minW AND $maxW AS ok_word_count,
    mean_word_len BETWEEN 3.0 AND 10.0 AS ok_mean_word_len,
    CAST(symbols AS DOUBLE) / nw <= 0.1 AS ok_symbol_ratio,
    CAST(bullets AS DOUBLE) / nl <= 0.9 AS ok_bullet_lines,
    CAST(ellipses AS DOUBLE) / nl <= 0.3 AS ok_ellipsis_lines,
    CAST(alpha_words AS DOUBLE) / nw >= 0.8 AS ok_alpha_words,
    stop_hits >= 2 AS ok_stopwords
  FROM m)
SELECT doc_id, n_words, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
  ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words, ok_stopwords,
  ok_word_count AND ok_mean_word_len AND ok_symbol_ratio AND ok_bullet_lines
    AND ok_ellipsis_lines AND ok_alpha_words AND ok_stopwords AS keep
FROM f ORDER BY doc_id"""
  }

  /** Stopword-hit language ID, first-in-order argmax (de,en,es,fr). */
  val langId: String = {
    val hitCols = graft.ops.TextMetrics.stopwords.map { case (lang, sw) =>
      val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(ws, x -> list_contains($lst, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = graft.ops.TextMetrics.stopwords.map(_._1)
    val gmax = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs.map(l => s"WHEN hits_$l = $gmax THEN '$l'").mkString(" ")
    s"""
WITH w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents
),
h AS (
  SELECT doc_id,
    $hitCols
  FROM w
)
SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
  CASE $caseChain END AS lang_pred
FROM h ORDER BY doc_id"""
  }

  /** Polynomial rolling-hash fingerprint (same mod arithmetic/order). */
  val docFingerprint: String = s"""
WITH n AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
)
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, length(t)), i -> CAST(ascii(t[i]) AS BIGINT))),
    (acc, c) -> (acc * 31 + c) % ${graft.ops.TextMetrics.FpMod}) AS fingerprint
FROM n ORDER BY doc_id"""

  /** The DuckDB form of TextMetrics.charFp applied to a lambda-bound
    * string `x`: polynomial rolling hash, identical arithmetic.
    */
  private def sqlCharFp(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(generate_series(1, length($x)), i -> CAST(ascii($x[i]) AS BIGINT))),
      (acc, c) -> (acc * 31 + c) % ${graft.ops.TextMetrics.FpMod})"""

  /** dsir_weights: the ENTIRE DSIR train+score chain re-derived — hashed
    * word buckets, Laplace-smoothed target/source distributions, per-doc
    * summed log ratio. The float log_weight uses the 1e-8 pass-through
    * verify (sum order + ln ULPs differ across engines).
    */
  /** The DSIR train+score CTE chain (through CTE `f`), shared by
    * `dsir_weights` and `dsir_resample`.
    */
  private lazy val dsirChain: String = {
    val m = graft.ops.Dsir.NumBuckets
    s"""
WITH w AS (
  SELECT doc_id, lang,
    string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
wb AS (
  SELECT doc_id, lang,
    list_transform(ws, x -> ${sqlCharFp("x")} % $m) AS bs
  FROM w),
e AS (SELECT doc_id, lang, unnest(bs) AS b FROM wb),
counts AS (
  SELECT b, count(*) AS cs,
    count(CASE WHEN lang = 'en' THEN 1 END) AS ct
  FROM e GROUP BY b),
tot AS (SELECT sum(cs) AS stot, sum(ct) AS ttot FROM counts),
lr AS (
  SELECT b, ln((ct + 1.0) / (ttot + $m)) - ln((cs + 1.0) / (stot + $m)) AS r
  FROM counts CROSS JOIN tot),
f AS (
  SELECT e.doc_id, count(*) AS n_words, sum(lr.r) AS log_weight
  FROM e JOIN lr USING (b) GROUP BY e.doc_id)"""
  }

  val dsirWeights: String = s"""$dsirChain
SELECT f.doc_id, f.n_words,
  CASE WHEN abs(f.log_weight - o.log_weight) < 1e-8 THEN o.log_weight
       ELSE f.log_weight END AS log_weight
FROM f JOIN read_parquet('{OUT}/dsir_weights/*.parquet') o USING (doc_id)
ORDER BY doc_id"""

  /** dsir_resample: the Gumbel-top-k selection re-derived end-to-end —
    * the uniform is the splitmix64 HUGEINT chain's top 53 bits (exact
    * double), the key is log_weight - ln(-ln(u)), top-k in-engine. Both
    * engines rank their OWN keys, so ln noise cancels away from the k-th
    * boundary (continuous keys — gaps are O(1/n), nine orders above the
    * noise).
    */
  // lazy: mixCols interpolates P64/P32, declared later in this object —
  // a strict val here would bake in nulls at construction order
  lazy val dsirResample: String = s"""$dsirChain,
g AS (SELECT doc_id, log_weight, ${mixCols("m_", "CAST(doc_id AS HUGEINT)")}
      FROM f),
ky AS (SELECT doc_id,
         log_weight - ln(-ln(CAST(m_out >> 11 AS DOUBLE) / 9007199254740992.0))
           AS key
       FROM g),
top AS (SELECT doc_id FROM ky ORDER BY key DESC, doc_id LIMIT 50)
SELECT doc_id FROM top ORDER BY doc_id"""

  /** span_dedup: per-word hashes, length-W window hashes, corpus-wide
    * occurrence counts, per-doc duplicated-window rollup — all
    * integer-exact (the dup fraction is one IEEE division).
    */
  val spanDedup: String = {
    val fpMod = graft.ops.TextMetrics.FpMod
    val w = 10
    s"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM documents),
fp AS (
  SELECT doc_id, list_transform(ws, x -> ${sqlCharFp("x")}) AS wfps FROM t),
wh AS (
  SELECT doc_id, list_transform(
    generate_series(1, greatest(len(wfps) - ${w - 1}, 0)),
    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), wfps[i:i+${w - 1}]),
      (acc, x) -> (acc * 31 + x) % $fpMod)) AS whs
  FROM fp),
e AS (SELECT doc_id, unnest(whs) AS wh FROM wh),
d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY 1) WHERE c >= 2),
pd AS (SELECT e.doc_id, count(*) AS dup_windows FROM e JOIN d USING (wh) GROUP BY 1)
SELECT h.doc_id,
  CAST(len(h.whs) AS BIGINT) AS n_windows,
  CAST(coalesce(pd.dup_windows, 0) AS BIGINT) AS dup_windows,
  CASE WHEN len(h.whs) = 0 THEN 0.0
       ELSE CAST(coalesce(pd.dup_windows, 0) AS DOUBLE) / len(h.whs) END AS dup_frac
FROM wh h LEFT JOIN pd USING (doc_id) ORDER BY doc_id"""
  }

  /** End-to-end curation pipeline (ops/Curation.scala): exact dedup →
    * near-dup removal (3-gram Jaccard >= 0.5, maxDf 1000, drop the larger
    * doc_id) → language filter (stopword-hit argmax = 'en') → md5-bucket
    * split + token counts. Each CTE mirrors the already-green
    * per-operator oracle; this checks the COMPOSITION.
    */
  val curationPipeline: String = {
    val hitCols = graft.ops.TextMetrics.stopwords.map { case (lang, sw) =>
      val lst = sw.map(w => s"'$w'").mkString("[", ",", "]")
      s"len(list_filter(ws, x -> list_contains($lst, x))) AS hits_$lang"
    }.mkString(",\n    ")
    val langs = graft.ops.TextMetrics.stopwords.map(_._1)
    val gmax = langs.map(l => s"hits_$l").mkString("greatest(", ", ", ")")
    val caseChain = langs.map(l => s"WHEN hits_$l = $gmax THEN '$l'").mkString(" ")
    s"""
WITH h AS (
  SELECT doc_id, text,
    md5(trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS text_hash
  FROM documents
),
s1 AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      doc_id = min(doc_id) OVER (PARTITION BY text_hash) AS keep
    FROM h) WHERE keep
),
w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM s1
),
shingled AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(ws) - 2, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
),
ex0 AS (SELECT doc_id, unnest(s) AS sh FROM shingled),
keepsh AS (SELECT sh FROM ex0 GROUP BY sh HAVING count(*) <= 1000),
ex AS (SELECT ex0.* FROM ex0 SEMI JOIN keepsh USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
neardup AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.5
),
s2 AS (SELECT * FROM s1 ANTI JOIN neardup USING (doc_id)),
wl AS (
  SELECT doc_id, text, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM s2
),
hl AS (
  SELECT doc_id, text,
    $hitCols
  FROM wl
),
s3 AS (SELECT doc_id, text FROM hl WHERE (CASE $caseChain END) = 'en')
SELECT doc_id,
  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
       THEN 'val' ELSE 'train' END AS split,
  len(string_split_regex(lower(trim(text)), '\\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens
FROM s3 ORDER BY doc_id"""
  }

  /** Set ops: conversations using both tools / search only. */
  def setOps(txDir: String): String = s"""
WITH tx AS (SELECT * FROM read_parquet('$txDir/transcripts.parquet/*.parquet')),
s AS (SELECT DISTINCT conv_id FROM tx WHERE tool = 'search'),
c AS (SELECT DISTINCT conv_id FROM tx WHERE tool = 'calculator')
SELECT conv_id, 'both_tools' AS op FROM (SELECT * FROM s INTERSECT SELECT * FROM c)
UNION ALL
SELECT conv_id, 'search_only' AS op FROM (SELECT * FROM s EXCEPT SELECT * FROM c)
ORDER BY op, conv_id"""

  /** curation_pipeline2: the round-5 data-selection composition —
    * exact dedup → span gate → Gopher rules (en-profile stopwords) →
    * survivor-trained perplexity terciles (drop tail) → per-domain quota.
    * Each CTE block mirrors its already-green per-operator oracle; this
    * checks the COMPOSITION (survivor-set coupling between stages, incl.
    * the LM training corpus being stage-3 survivors, not `documents`).
    */
  val curationPipeline2: String = {
    val m = graft.ops.TextMetrics.FpMod
    val enStops = graft.ops.TextMetrics.stopwords.toMap.apply("en")
      .map(w => s"'$w'").mkString("[", ",", "]")
    val (spanW1, cap) = (9, 5) // spanW-1; quota cap
    s"""
WITH
h0 AS (SELECT doc_id, md5(trim(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS text_hash
       FROM documents),
k0 AS (SELECT doc_id FROM (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY text_hash) AS k FROM h0) WHERE k),
s1 AS (SELECT d.* FROM documents d JOIN k0 USING (doc_id)),
w2 AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM s1),
fp2 AS (SELECT doc_id, list_transform(ws, x -> ${sqlCharFp("x")}) AS wfps FROM w2),
wh2 AS (SELECT doc_id, list_transform(generate_series(1, greatest(len(wfps) - $spanW1, 0)),
    i -> list_reduce(list_prepend(CAST(0 AS BIGINT), wfps[i:i+$spanW1]),
         (acc, x) -> (acc * 31 + x) % $m)) AS whs FROM fp2),
e2 AS (SELECT doc_id, unnest(whs) AS wh FROM wh2),
d2 AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e2 GROUP BY 1) WHERE c >= 2),
pd2 AS (SELECT e2.doc_id, count(*) AS dup FROM e2 JOIN d2 USING (wh) GROUP BY 1),
s2 AS (SELECT s1.* FROM s1 JOIN wh2 USING (doc_id) LEFT JOIN pd2 USING (doc_id)
       WHERE len(wh2.whs) = 0 OR CAST(coalesce(pd2.dup, 0) AS DOUBLE) / len(wh2.whs) <= 0.5),
b3 AS (SELECT doc_id, text, lower(trim(text)) AS lt,
       string_split_regex(lower(trim(text)), '\\s+') AS ws,
       string_split(text, chr(10)) AS lines FROM s2),
m3 AS (SELECT doc_id,
    CAST(len(ws) AS BIGINT) AS n_words,
    CAST(greatest(len(ws), 1) AS DOUBLE) AS nw,
    CAST(length(regexp_replace(lt, '\\s+', '', 'g')) AS DOUBLE) / greatest(len(ws), 1) AS mwl,
    CAST((length(text) - length(replace(text, '#', ''))) AS BIGINT)
      + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
    CAST(greatest(len(lines), 1) AS DOUBLE) AS nl,
    len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
      OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•'))) AS bullets,
    len(list_filter(lines, l -> ends_with(rtrim(l), '...'))) AS ellipses,
    len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS alpha_words,
    len(list_intersect(list_distinct(ws), $enStops)) AS stop_hits
  FROM b3),
g3 AS (SELECT doc_id FROM m3 WHERE n_words BETWEEN 50 AND 100000
    AND mwl BETWEEN 3.0 AND 10.0 AND CAST(symbols AS DOUBLE) / nw <= 0.1
    AND CAST(bullets AS DOUBLE) / nl <= 0.9 AND CAST(ellipses AS DOUBLE) / nl <= 0.3
    AND CAST(alpha_words AS DOUBLE) / nw >= 0.8 AND stop_hits >= 2),
s3 AS (SELECT s2.* FROM s2 JOIN g3 USING (doc_id)),
t4 AS (SELECT doc_id, lower(text) AS lt FROM s3),
tri4 AS (SELECT doc_id, substring(lt, CAST(i AS INT), 3) AS g
  FROM t4, LATERAL unnest(generate_series(1, greatest(len(lt) - 2, 0))) AS u(i)),
tl4 AS (SELECT tri4.doc_id, d.lang, g FROM tri4 JOIN (SELECT doc_id, lang FROM s3) d USING (doc_id)),
model4 AS (SELECT lang AS mlang, g, count(*) AS c FROM tl4 GROUP BY 1, 2),
totals4 AS (SELECT mlang, sum(c) AS tot FROM model4 GROUP BY 1),
vocab4 AS (SELECT count(DISTINCT g) AS v FROM tl4),
sc4 AS (SELECT tri4.doc_id, count(*) AS n_tri,
    SUM(ln((COALESCE(mm.c, 0) + 1.0) / (tt.tot + v.v))) AS score
  FROM tri4 LEFT JOIN model4 mm ON mm.mlang = 'en' AND mm.g = tri4.g
  CROSS JOIN (SELECT tot FROM totals4 WHERE mlang = 'en') tt CROSS JOIN vocab4 v
  GROUP BY tri4.doc_id),
f4 AS (SELECT t4.doc_id, CASE WHEN sc4.n_tri IS NULL THEN 0.0 ELSE sc4.score / sc4.n_tri END AS mean_logp
  FROM t4 LEFT JOIN sc4 USING (doc_id)),
th4 AS (SELECT quantile_cont(mean_logp, 1.0/3) AS t13, quantile_cont(mean_logp, 2.0/3) AS t23 FROM f4),
pb4 AS (SELECT f4.doc_id, CASE WHEN f4.mean_logp >= th4.t23 THEN 'head'
    WHEN f4.mean_logp >= th4.t13 THEN 'middle' ELSE 'tail' END AS bucket FROM f4 CROSS JOIN th4),
s4 AS (SELECT s3.*, pb4.bucket FROM s3 JOIN pb4 USING (doc_id) WHERE pb4.bucket != 'tail'),
r5 AS (SELECT source AS domain, doc_id, bucket,
    row_number() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM s4)
SELECT doc_id, domain, bucket, CAST(rk AS BIGINT) AS rk
FROM r5 WHERE rk <= $cap ORDER BY doc_id"""
  }

  def cubeStats(txDir: String): String = s"""
SELECT role, text IS NOT NULL AS has_text, count(*) AS n
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY CUBE(role, has_text)
ORDER BY role NULLS FIRST, has_text NULLS FIRST, n"""

  /** Exact + HLL cardinality: the approx estimate is not DuckDB-
    * reproducible, so the query emits `approx_ok` = |approx-exact| <= 10%
    * and the oracle asserts the literal TRUE alongside the exact values.
    */
  def cardinalityApprox(txDir: String): String = s"""
SELECT role, count(*) AS n, count(DISTINCT conv_id) AS n_convs,
  true AS approx_ok
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
GROUP BY role ORDER BY role"""

  // ------------------------------------------------------------- joins

  /** TPC-H Q3-flavored 3-table join (customer ⋈ orders ⋈ lineitem). */
  val q3Join: String = """
SELECT o_orderkey, o_orderdate, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 20"""

  /** TPC-H Q5-flavored 6-table join with the local-supplier rule. */
  val q5Join: String = """
SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY n_name"""

  /** Blacklist-off promotion (V13 / quirk Q5): every message becomes
    * valid; originally-rejected ones carry promoted=true and KEEP their
    * reason + uuid (the reference flips only the forwarding decision,
    * TopologyProducer.java:283-284).
    */
  def decisionsPromoted(txDir: String): String = s"""
SELECT d.conv_id, d.turn_idx, d.role, 'valid' AS decision, d.reason, d.uuid,
  d.decision = 'rejected' AS promoted
FROM (${decisions(txDir)}) d
ORDER BY d.conv_id, d.turn_idx"""

  /** Q14-style part⋈lineitem: per-brand promo revenue share in a
    * ship-date window.
    */
  val q14Join: String = """
SELECT p_brand,
  sum(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END) AS promo_revenue,
  sum(l_extendedprice * (1 - l_discount)) AS total_revenue,
  count(*) AS n_items,
  100.0 * sum(CASE WHEN p_type = 'PROMO'
      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
    / sum(l_extendedprice * (1 - l_discount)) AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
GROUP BY p_brand
ORDER BY p_brand"""

  /** Typed-Aggregator UDAF oracle: DuckDB's native quantile_cont is the
    * independent formulation of ExactQuantile's interpolation.
    */
  def udafStats(txDir: String): String = s"""
SELECT conv_id, count(*) AS n_texts,
  quantile_cont(length(text), 0.5) AS median_len,
  quantile_cont(length(text), 0.9) AS p90_len
FROM read_parquet('$txDir/transcripts.parquet/*.parquet')
WHERE text IS NOT NULL
GROUP BY conv_id
ORDER BY conv_id"""

  /** left_semi: orders having at least one lineitem. */
  val semiJoin: String = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
ORDER BY o_orderkey"""

  /** left_anti: customers with no urgent-priority order. */
  val antiJoin: String = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey"""

  /** As-of join: each purchase event matched to the latest prior-or-equal
    * click event of the same user (DuckDB native ASOF JOIN as the oracle
    * for the engine's union+window merge formulation).
    */
  val asofJoin: String = """
SELECT p.event_id, p.user_id, p.ts, p.value,
       c2.event_id AS r_event_id, c2.ts AS r_ts, c2.value AS r_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
JOIN (SELECT * FROM events WHERE event_type = 'click') c2
  ON c2.user_id = p.user_id AND c2.ts = c.ts
QUALIFY row_number() OVER (PARTITION BY p.event_id ORDER BY c2.event_id DESC) = 1
ORDER BY p.event_id"""

  // ------------------------------------- dump-referencing verify oracles
  // ({OUT} = the Verify dump dir): the candidate SET of an LSH/ANN op is
  // hash-dependent (xxhash64 has no DuckDB equivalent), but the METRIC on
  // each emitted row is exactly recomputable — so the oracle reads the
  // emitted pairs and independently re-derives every metric column.

  private def cosExpr(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len($a)),
      i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x + y)
    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len($a)),
         i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))), (x,y) -> x + y))
     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len($b)),
         i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x,y) -> x + y)))"""

  /** sq_topk: the int8 scalar quantization is fully deterministic, so the
    * whole chain is re-derived — per-dim bounds, code = clamp(floor(
    * (x-mn)*255/(mx-mn)),0,255), midpoint reconstruction, cosine (same
    * sequential sum), and the rank order.
    */
  val sqTopK: String = s"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
stats AS (
  SELECT i AS d, min(CAST(embedding[i] AS DOUBLE)) AS mn,
         max(CAST(embedding[i] AS DOUBLE)) AS mx
  FROM e, LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
  GROUP BY 1
),
b AS (SELECT list(mn ORDER BY d) AS mnl, list(mx ORDER BY d) AS mxl FROM stats),
r AS (
  SELECT vec_id, list_transform(generate_series(1, len(embedding)),
    i -> mnl[i] + (CASE WHEN mxl[i] = mnl[i] THEN 0.0
         ELSE least(greatest(floor((CAST(embedding[i] AS DOUBLE) - mnl[i])
                * 255.0 / (mxl[i] - mnl[i])), 0.0), 255.0) END
         + 0.5) * (mxl[i] - mnl[i]) / 255.0) AS v
  FROM e CROSS JOIN b
),
q AS (SELECT vec_id AS q_id, v AS qv FROM r WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.q_id, r.vec_id, ${cosExpr("qv", "r.v")} AS cos
  FROM r CROSS JOIN q WHERE r.vec_id != q.q_id
)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY q_id, rank"""

  /** lsh_cosine_pairs: re-verify the exact cosine of every emitted pair. */
  val lshCosineVerify: String = s"""
WITH p AS (SELECT vec_a, vec_b FROM read_parquet('{OUT}/lsh_cosine_pairs/*.parquet'))
SELECT p.vec_a, p.vec_b, ${cosExpr("a.embedding", "b.embedding")} AS cos
FROM p
JOIN embeddings a ON a.vec_id = p.vec_a
JOIN embeddings b ON b.vec_id = p.vec_b
ORDER BY vec_a, vec_b"""

  /** semantic_dedup: the cluster assignment is k-means-dependent (not SQL-
    * rederivable), but every emitted pair's exact cosine is — and planted
    * identical twins land in one cluster regardless of centroids, so the
    * pair set is non-empty by construction. Same {OUT} contract as the
    * LSH verify.
    */
  val semanticDedupVerify: String = s"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 500000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10),
p AS (SELECT vec_a, vec_b FROM read_parquet('{OUT}/semantic_dedup/*.parquet'))
SELECT p.vec_a, p.vec_b, ${cosExpr("a.embedding", "b.embedding")} AS cos
FROM p
JOIN e a ON a.vec_id = p.vec_a
JOIN e b ON b.vec_id = p.vec_b
ORDER BY vec_a, vec_b"""

  /** ivf_topk: re-verify the cosine of every emitted (q,candidate) row AND
    * that the emitted rank equals cos-desc order within the emitted set.
    */
  /** pq_topk: the shortlist is codebook-approximate by construction, but
    * the final ranks are exact-cosine over the reranked survivors — cos
    * AND rank re-derived from raw embeddings, same form as ivfVerify.
    */
  val pqVerify: String = s"""
WITH p AS (SELECT q_id, vec_id FROM read_parquet('{OUT}/pq_topk/*.parquet')),
scored AS (
  SELECT p.q_id, p.vec_id, ${cosExpr("q.embedding", "e.embedding")} AS cos
  FROM p
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN embeddings e ON e.vec_id = p.vec_id
)
SELECT q_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY q_id, rank"""

  /** jl_distortion: the FULL projection + both cosines re-derived — the
    * sign matrix is injected as the identical literal (entries +-0.25,
    * exact doubles), folds run in the same ascending order, so the
    * compare is bit-exact with no tolerance pass-through. Matrix shape
    * pinned to the fixture's 64-dim embeddings.
    */
  val jlDistortion: String = {
    val p = graft.ops.Similarity.jlMatrix(64, 16)
    val pLit = p.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    s"""
WITH pm AS (SELECT $pLit AS p),
b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pr AS (SELECT vec_id, v,
  list_transform(generate_series(1, 16), j ->
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, 64),
      i -> v[i] * p[i][j])), (a, c) -> a + c)) AS pv
  FROM b CROSS JOIN pm),
q AS (SELECT vec_id AS q_id, v AS qv, pv AS pqv FROM pr WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, v, pv FROM pr WHERE vec_id % 17 = 0)
SELECT q.q_id, c.vec_id,
  ${cosExpr("q.qv", "c.v")} AS cos_orig,
  ${cosExpr("q.pqv", "c.pv")} AS cos_proj
FROM c JOIN q ON c.vec_id != q.q_id
ORDER BY q_id, vec_id"""
  }

  val ivfVerify: String = s"""
WITH p AS (SELECT q_id, vec_id FROM read_parquet('{OUT}/ivf_topk/*.parquet')),
scored AS (
  SELECT p.q_id, p.vec_id, ${cosExpr("q.embedding", "e.embedding")} AS cos
  FROM p
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN embeddings e ON e.vec_id = p.vec_id
)
SELECT q_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY q_id, rank"""

  /** Same re-derivation for the incrementally-maintained index (build on
    * half the corpus, append the rest under frozen centroids).
    */
  val ivfAppendedVerify: String = s"""
WITH p AS (SELECT q_id, vec_id FROM read_parquet('{OUT}/ivf_topk_appended/*.parquet')),
scored AS (
  SELECT p.q_id, p.vec_id, ${cosExpr("q.embedding", "e.embedding")} AS cos
  FROM p
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN embeddings e ON e.vec_id = p.vec_id
)
SELECT q_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY q_id, rank"""

  /** Same re-derivation for the persisted-index serving path. */
  val ivfIndexedVerify: String = s"""
WITH p AS (SELECT q_id, vec_id FROM read_parquet('{OUT}/ivf_topk_indexed/*.parquet')),
scored AS (
  SELECT p.q_id, p.vec_id, ${cosExpr("q.embedding", "e.embedding")} AS cos
  FROM p
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN embeddings e ON e.vec_id = p.vec_id
)
SELECT q_id, vec_id, cos,
  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
FROM scored ORDER BY q_id, rank"""

  private val shingleSets: String = """
w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(len(ws) - 2, 0)),
    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM w
)"""

  /** page_rank: the near-dup edge derivation AND three damped power
    * iterations with dangling-mass redistribution, all unrolled in SQL
    * (the GD-unroll pattern of `quality_classifier`); the float rank uses
    * the 1e-8 pass-through verify (neighbor-sum order + the driver-baked
    * dangling scalar differ across engines at ~1e-15).
    */
  lazy val pageRank: String = {
    def iter(i: Int): String = s"""
dg$i AS (SELECT coalesce(sum(pr), 0.0) AS dang
  FROM p$i LEFT JOIN deg ON p$i.doc_id = deg.src WHERE deg.src IS NULL),
c$i AS (SELECT e.doc_b AS dst, sum(p.pr / d.deg) AS c
  FROM edges e JOIN p$i p ON p.doc_id = e.doc_a JOIN deg d ON d.src = e.doc_a
  GROUP BY 1),
p${i + 1} AS (SELECT nodes.doc_id,
    ((1.0 - 0.85) / nn.n) + 0.85 * (coalesce(c$i.c, 0.0) + dg$i.dang / nn.n) AS pr
  FROM nodes CROSS JOIN nn CROSS JOIN dg$i
  LEFT JOIN c$i ON c$i.dst = nodes.doc_id),"""
    s"""
WITH $shingleSets,
ex0 AS (SELECT doc_id, unnest(s) AS g FROM sh),
keep AS (SELECT g FROM ex0 GROUP BY g HAVING count(*) <= 1000),
ex AS (SELECT ex0.* FROM ex0 SEMI JOIN keep USING (g)),
sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
prs AS (
  SELECT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY 1, 2) p
  JOIN sizes sa ON p.doc_a = sa.doc_id
  JOIN sizes sb ON p.doc_b = sb.doc_id
  WHERE CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) >= 0.3),
edges AS (SELECT doc_a, doc_b FROM prs
          UNION ALL SELECT doc_b AS doc_a, doc_a AS doc_b FROM prs),
nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT doc_a AS src, count(*) AS deg FROM edges GROUP BY 1),
p0 AS (SELECT doc_id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn),
${iter(0)}${iter(1)}${iter(2)}
f AS (SELECT doc_id, pr FROM p3)
SELECT f.doc_id,
  CASE WHEN abs(f.pr - o.pr) < 1e-8 THEN o.pr ELSE f.pr END AS pr
FROM f JOIN read_parquet('{OUT}/page_rank/*.parquet') o USING (doc_id)
ORDER BY doc_id"""
  }

  /** lang_id_trained: the ENTIRE trained model re-derived in SQL —
    * trigram counts, Laplace smoothing, per-doc log-likelihood argmax
    * (score desc, lang asc tiebreak). Scores are float sums whose order
    * differs between engines, so the compared column is the argmax;
    * measured runner-up margins on the fixture corpus are >= 3e-3, seven
    * orders above double-reordering noise.
    */
  val langIdTrained: String = """
WITH t AS (SELECT doc_id, lang, lower(text) AS lt FROM documents),
tri AS (
  SELECT doc_id, substring(lt, CAST(i AS INT), 3) AS g
  FROM t, LATERAL unnest(generate_series(1, greatest(len(lt) - 2, 0))) AS u(i)
),
tl AS (SELECT tri.doc_id, t.lang, g FROM tri JOIN t USING (doc_id)),
model AS (SELECT lang AS mlang, g, count(*) AS c FROM tl GROUP BY 1, 2),
totals AS (SELECT mlang, sum(c) AS tot FROM model GROUP BY 1),
vocab AS (SELECT count(DISTINCT g) AS v FROM tl),
langs AS (SELECT DISTINCT lang AS mlang FROM documents),
scores AS (
  SELECT d.doc_id, l.mlang,
    SUM(ln((COALESCE(m.c, 0) + 1.0) / (tt.tot + v.v))) AS score
  FROM tri d
  CROSS JOIN langs l
  LEFT JOIN model m ON m.mlang = l.mlang AND m.g = d.g
  JOIN totals tt ON tt.mlang = l.mlang
  CROSS JOIN vocab v
  GROUP BY d.doc_id, l.mlang
),
pred AS (
  SELECT doc_id, mlang AS lang_pred,
    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, mlang ASC) AS rn
  FROM scores)
SELECT t.doc_id, t.lang, p.lang_pred
FROM t JOIN pred p ON p.doc_id = t.doc_id AND p.rn = 1
ORDER BY t.doc_id"""

  /** lm_score: the ENTIRE train+score chain re-derived — trigram counts,
    * Laplace smoothing, per-doc mean log-likelihood under the 'en' model.
    * Each emitted mean_logp is verified against the re-derivation to 1e-8
    * and passed through on agreement ({OUT} pattern): ln sums accumulate
    * in different orders / ULPs across engines, so bit-equality is the
    * wrong contract for this one float column.
    */
  /** The train+score CTE chain shared by `lm_score` and
    * `perplexity_buckets`: trigram counts, Laplace smoothing, per-doc mean
    * log-likelihood under the 'en' model, ending at CTE `f`.
    */
  private val lmScoreChain: String = """
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
tri AS (
  SELECT doc_id, substring(lt, CAST(i AS INT), 3) AS g
  FROM t, LATERAL unnest(generate_series(1, greatest(len(lt) - 2, 0))) AS u(i)
),
tl AS (SELECT tri.doc_id, d.lang, g
       FROM tri JOIN (SELECT doc_id, lang FROM documents) d USING (doc_id)),
model AS (SELECT lang AS mlang, g, count(*) AS c FROM tl GROUP BY 1, 2),
totals AS (SELECT mlang, sum(c) AS tot FROM model GROUP BY 1),
vocab AS (SELECT count(DISTINCT g) AS v FROM tl),
sc AS (
  SELECT tri.doc_id, count(*) AS n_trigrams,
    SUM(ln((COALESCE(m.c, 0) + 1.0) / (tt.tot + v.v))) AS score
  FROM tri
  LEFT JOIN model m ON m.mlang = 'en' AND m.g = tri.g
  CROSS JOIN (SELECT tot FROM totals WHERE mlang = 'en') tt
  CROSS JOIN vocab v
  GROUP BY tri.doc_id
),
f AS (
  SELECT t.doc_id, COALESCE(sc.n_trigrams, 0) AS n_trigrams,
    CASE WHEN sc.n_trigrams IS NULL THEN 0.0
         ELSE sc.score / sc.n_trigrams END AS mean_logp
  FROM t LEFT JOIN sc USING (doc_id)
)"""

  val lmScore: String = s"""$lmScoreChain
SELECT f.doc_id, f.n_trigrams,
  CASE WHEN abs(f.mean_logp - o.mean_logp) < 1e-8 THEN o.mean_logp
       ELSE f.mean_logp END AS mean_logp
FROM f JOIN read_parquet('{OUT}/lm_score/*.parquet') o USING (doc_id)
ORDER BY doc_id"""

  /** CCNet-style perplexity bucketing: terciles of the corpus lm score,
    * thresholds via SQL-standard continuous quantiles (the exact
    * semantics of Spark `percentile`). Bucket membership compares
    * IN-ENGINE scores against IN-ENGINE thresholds, so cross-engine ln
    * noise cancels unless a tercile boundary gap is below ~1e-9 — the
    * fixture corpus's adjacent-score gaps are ~1e-3.
    */
  val perplexityBuckets: String = s"""$lmScoreChain,
th AS (
  SELECT quantile_cont(mean_logp, 1.0/3) AS t13,
         quantile_cont(mean_logp, 2.0/3) AS t23
  FROM f)
SELECT f.doc_id,
  CASE WHEN f.mean_logp >= th.t23 THEN 'head'
       WHEN f.mean_logp >= th.t13 THEN 'middle'
       ELSE 'tail' END AS bucket
FROM f CROSS JOIN th
ORDER BY doc_id"""

  /** bpe_token_counts: ws_tokens and the tokens-cover-text invariant
    * (bpe_chars = sum of word lengths + 4 end-markers per word) re-derived
    * from the raw text; bpe_tokens is echoed from {OUT} because the merge
    * table is learned from the corpus (BPE training is not
    * SQL-expressible — BpeSpec pins it against hand-checked histograms
    * and a driver-side re-encode of every document).
    */
  val bpeTokenCounts: String = """
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS ws
  FROM documents
)
SELECT w.doc_id,
  CAST(len(ws) AS BIGINT) AS ws_tokens,
  o.bpe_tokens,
  CAST(list_reduce(list_prepend(0, list_transform(ws, x -> len(x))), (a, b) -> a + b)
       + 4 * len(ws) AS BIGINT) AS bpe_chars
FROM w
JOIN read_parquet('{OUT}/bpe_token_counts/*.parquet') o ON o.doc_id = w.doc_id
ORDER BY w.doc_id"""

  /** minhash_pairs: true 3-gram Jaccard of every emitted pair re-derived
    * from the raw text (est_jaccard passes through — xxhash-dependent).
    */
  val minhashVerify: String = s"""
WITH p AS (SELECT doc_a, doc_b, est_jaccard FROM read_parquet('{OUT}/minhash_pairs/*.parquet')),
$shingleSets
SELECT p.doc_a, p.doc_b, p.est_jaccard,
  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / len(list_distinct(list_concat(a.s, b.s))) AS true_jaccard
FROM p
JOIN sh a ON a.doc_id = p.doc_a
JOIN sh b ON b.doc_id = p.doc_b
ORDER BY doc_a, doc_b"""

  /** simhash_pairs: hamming passes through (hash-dependent); the true
    * 3-gram Jaccard column is re-derived from the raw text.
    */
  val simhashVerify: String = s"""
WITH p AS (SELECT doc_a, doc_b, hamming FROM read_parquet('{OUT}/simhash_pairs/*.parquet')),
$shingleSets
SELECT p.doc_a, p.doc_b, p.hamming,
  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / len(list_distinct(list_concat(a.s, b.s))) AS true_jaccard
FROM p
JOIN sh a ON a.doc_id = p.doc_a
JOIN sh b ON b.doc_id = p.doc_b
ORDER BY doc_a, doc_b"""

  /** Multimodal synthesize metadata: media_type and payload size are pure
    * functions of (doc_id, n_chars) — independently re-derivable even
    * though the payload bytes / features come from the stubbed decoder.
    */
  /** Media container sizes re-derived from (doc_id, n_chars): WAV = 44-byte
    * canonical header + 2 bytes/sample; BMP = 54-byte header + 4-byte-
    * aligned row stride x height; PNG (stored-deflate, single IDAT) =
    * 68 bytes of sig/IHDR/chunk+zlib overhead + h*(1+3w) raw scanlines
    * (Multimodal.synthesize/wavFile/bmpFile/pngFile/pngFileLength).
    */
  val multimodalMeta: String = """
SELECT doc_id,
  CASE WHEN doc_id % 3 = 0 THEN 'audio' ELSE 'image' END AS media_type,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 44 + 2 * (32 + (n_chars % 96))
       WHEN doc_id % 3 = 1
         THEN 54 + (((5 + doc_id % 8) * 3 + 3) // 4 * 4) * (4 + (n_chars % 5))
       ELSE 68 + (4 + (n_chars % 5)) * (1 + 3 * (5 + doc_id % 8))
       END AS INT) AS n_bytes
FROM documents ORDER BY doc_id"""

  /** Brute-force cosine top-k (k=10, stride=50), sequential-sum doubles. */
  val cosineTopK: String = """
WITH e AS (SELECT vec_id, embedding FROM embeddings),
q AS (SELECT vec_id AS q_id, embedding AS qe FROM e WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.q_id, e.vec_id,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len(qe)),
      i -> CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (a,x) -> a + x)
    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len(qe)),
         i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))), (a,x) -> a + x))
     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len(e.embedding)),
         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), (a,x) -> a + x)))
    AS cos
  FROM e CROSS JOIN q WHERE e.vec_id != q.q_id
)
SELECT q_id, vec_id, cos, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= 10
ORDER BY q_id, rank"""

  // -------- multimodal_features: full re-derivation of the synth+decode+
  // extract chain (Multimodal.scala). The media DATA section (BMP/PNG
  // pixel stream / WAV PCM bytes) is a splitmix64 byte stream of doc_id,
  // wrapped in a REAL container the engine actually parses (BMP header +
  // row padding, RIFF chunk walk, PNG via the JDK's ImageIO codec —
  // inflate + filter reconstruction); checksum is a wrapping ck*31+b Long fold over the
  // decoded content bytes; image feature lane j = sum of pixel bytes at
  // positions ≡ j (mod 16); audio lane j = sum of |int16 sample| over
  // samples ≡ j (mod 16) — integer sums below 2^24, so the engine's
  // float32 accumulation is EXACT and engine doubles equal these integer
  // sums bit-for-bit. A decoder that misreads the stride/padding/chunk
  // layout shifts every byte and fails this oracle. splitmix64 runs via
  // HUGEINT mod-2^64 arithmetic (the 64x64 multiply split 32/32 so the
  // product never overflows the 128-bit HUGEINT), the byte stream via a
  // recursive CTE over 8-byte blocks.

  private val P64 = "CAST('18446744073709551616' AS HUGEINT)"
  private val P32 = "CAST('4294967296' AS HUGEINT)"

  /** (a * c) mod 2^64 for a in [0,2^64), constant c, without overflowing
    * HUGEINT: split a into hi/lo 32-bit halves.
    */
  private def mul64(a: String, c: String): String =
    s"((((($a) >> 32) * CAST('$c' AS HUGEINT)) % $P32) * $P32 + " +
      s"(($a) & CAST('4294967295' AS HUGEINT)) * CAST('$c' AS HUGEINT)) % $P64"

  /** splitmix64 `mix` (TranscriptGen.mix) as a lateral-alias column chain:
    * emits aliased steps `<pre>z1..<pre>out`; the caller selects
    * `<pre>out`. Constants are the unsigned decimal forms of
    * 0x9e3779b97f4a7c15 / 0xbf58476d1ce4e5b9 / 0x94d049bb133111eb.
    */
  private def mixCols(pre: String, zin: String): String = s"""
      (($zin) + CAST('11400714819323198485' AS HUGEINT)) % $P64 AS ${pre}z1,
      xor(${pre}z1, ${pre}z1 >> 30) AS ${pre}x1,
      ${mul64(pre + "x1", "13787848793156543929")} AS ${pre}z2,
      xor(${pre}z2, ${pre}z2 >> 27) AS ${pre}x2,
      ${mul64(pre + "x2", "10723151780598845931")} AS ${pre}z3,
      xor(${pre}z3, ${pre}z3 >> 31) AS ${pre}out"""

  val multimodalFeatures: String = s"""
WITH RECURSIVE
p AS (SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'audio' ELSE 'image' END AS media_type,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 2 * (32 + (n_chars % 96))
             ELSE (5 + doc_id % 8) * (4 + (n_chars % 5)) * 3
             END AS INT) AS len,
        CAST(CASE WHEN doc_id % 3 = 0 THEN 44 + 2 * (32 + (n_chars % 96))
             WHEN doc_id % 3 = 1
               THEN 54 + (((5 + doc_id % 8) * 3 + 3) // 4 * 4) * (4 + (n_chars % 5))
             ELSE 68 + (4 + (n_chars % 5)) * (1 + 3 * (5 + doc_id % 8))
             END AS INT) AS n_bytes
      FROM documents),
seed AS (
  SELECT doc_id, len, ${mixCols("a_", "CAST(doc_id AS HUGEINT)")}
  FROM p
),
blocks AS (
  SELECT doc_id, len, 0 AS k, b_out AS h FROM (
    SELECT doc_id, len, ${mixCols("b_", "a_out")} FROM seed)
  UNION ALL
  SELECT doc_id, len, k + 1, c_out AS h FROM (
    SELECT doc_id, len, k, ${mixCols("c_", "h + CAST((k+1)*8 AS HUGEINT)")}
    FROM blocks WHERE (k+1)*8 < len)
),
bytes AS (
  SELECT b.doc_id, b.k*8 + u.j AS i,
         CAST((b.h >> (u.j*8)) & CAST(255 AS HUGEINT) AS INT) AS byte
  FROM blocks b CROSS JOIN (SELECT unnest(generate_series(0,7)) AS j) u
  WHERE b.k*8 + u.j < b.len
),
ifeat AS (
  SELECT b.doc_id, CAST(b.i % 16 AS INT) AS lane, SUM(b.byte) AS v
  FROM bytes b JOIN p ON p.doc_id = b.doc_id AND p.media_type = 'image'
  GROUP BY b.doc_id, b.i % 16
),
samp AS (
  SELECT b0.doc_id, b0.i // 2 AS k,
    CASE WHEN b0.byte + 256 * b1.byte >= 32768
         THEN b0.byte + 256 * b1.byte - 65536
         ELSE b0.byte + 256 * b1.byte END AS v
  FROM bytes b0
  JOIN bytes b1 ON b1.doc_id = b0.doc_id AND b1.i = b0.i + 1
  JOIN p ON p.doc_id = b0.doc_id AND p.media_type = 'audio'
  WHERE b0.i % 2 = 0
),
afeat AS (
  SELECT doc_id, CAST(k % 16 AS INT) AS lane, SUM(ABS(v)) AS v
  FROM samp GROUP BY doc_id, k % 16
),
feat AS (SELECT * FROM ifeat UNION ALL SELECT * FROM afeat),
ck AS (
  SELECT doc_id,
    list_reduce(list_prepend(CAST(0 AS HUGEINT), list(CAST(byte AS HUGEINT) ORDER BY i)),
      (a, x) -> (a*31 + x) % $P64) AS cku
  FROM bytes GROUP BY doc_id
)
SELECT p.doc_id, p.media_type, p.n_bytes,
  CAST(CASE WHEN ck.cku >= CAST('9223372036854775808' AS HUGEINT)
       THEN ck.cku - $P64 ELSE ck.cku END AS BIGINT) AS checksum,
  ${(0 until 16).map(j =>
      s"CAST(max(CASE WHEN f.lane = $j THEN f.v END) AS DOUBLE) AS f$j").mkString(",\n  ")}
FROM p JOIN ck ON ck.doc_id = p.doc_id JOIN feat f ON f.doc_id = p.doc_id
GROUP BY p.doc_id, p.media_type, p.n_bytes, ck.cku
ORDER BY p.doc_id"""
}
