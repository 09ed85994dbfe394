package graft.queries

/** DuckDB re-derivation of the RCA loop's FINAL STATE
  * (trace_rca_final) under the registered Config(maxIterations = 5,
  * maxLlmCalls = 3) on the XML fixture.
  *
  * The loop is deterministic given the stub model, so its end state is a
  * pure function of the data: Phase A assembles evidence summaries, the
  * first LLM call hashes the exact prompt bytes (question + empty Events
  * section — the fixture has no severity ≥ 30 events — + 16 evidence
  * lines), and the stop rule compares the stub confidence (hash % 100 /
  * 100) against the 0.8 threshold with a hotspot-inspected /
  * coverage-complete side condition that the dive step always satisfies.
  *
  * This oracle re-derives every evidence string (severity counts,
  * histogram, span, heatmap, rollback carried-scan, baselines count,
  * episode count, the 6-detector battery via the shared duckBatterySql,
  * hotspots, timeline), reassembles the prompt, folds the same rolling
  * hash, and applies the same stop CASE. If the first call's confidence
  * clears the threshold (it does on this fixture: 0.9), the loop stops at
  * iteration 2 after one call. The ELSE branches emit loud
  * ORACLE-UNDERIVED sentinels: should the fixture ever change regime
  * (confidence < 0.8 → the loop would run more calls whose prompts grow
  * with dive context), the compare FAILS visibly instead of silently
  * blessing a wrong row.
  */
object RcaFinalOracle {

  /** The shared CTE chain: fixture parse → the 16 Phase-A/B evidence
    * strings → the first call's prompt bytes → its rolling hash. Both the
    * final-state oracle and the full-trace oracle select off this. */
  private lazy val prelude: String = {
    import TraceQueries.{XmlFixture, duckLines, duckMandatory, duckExcludedBaseline, duckBatterySql}
    s"""WITH evx AS (
      |  SELECT strptime(regexp_extract(line, 'DateTime="([^"]*)"', 1), '%Y-%m-%dT%H:%M:%SZ') AS ts,
      |    TRY_CAST(regexp_extract(line, 'Severity="([^"]*)"', 1) AS INTEGER) AS severity,
      |    regexp_extract(line, ' Type="([^"]*)"', 1) AS event,
      |    TRY_CAST(COALESCE(
      |      nullif(regexp_extract(line, ' VersionLag="([^"]*)"', 1), ''),
      |      nullif(regexp_extract(line, ' versionLag="([^"]*)"', 1), ''),
      |      nullif(regexp_extract(line, ' VersionLagValue="([^"]*)"', 1), ''),
      |      nullif(regexp_extract(line, ' Lag="([^"]*)"', 1), ''),
      |      nullif(regexp_extract(line, ' lag="([^"]*)"', 1), '')) AS DOUBLE) AS lag_v,
      |    CASE WHEN regexp_matches(COALESCE(nullif(regexp_extract(line, ' CommittedVersion="([^"]*)"', 1), ''), ''), '^[+-]?\\d{1,18}$$') THEN CAST(regexp_extract(line, ' CommittedVersion="([^"]*)"', 1) AS BIGINT) END AS cv,
      |    CASE WHEN regexp_matches(COALESCE(nullif(regexp_extract(line, ' DurableVersion="([^"]*)"', 1), ''), ''), '^[+-]?\\d{1,18}$$') THEN CAST(regexp_extract(line, ' DurableVersion="([^"]*)"', 1) AS BIGINT) END AS dv,
      |    CASE WHEN regexp_extract(line, ' Type="([^"]*)"', 1) = 'RecoveryState' AND regexp_matches(COALESCE(nullif(regexp_extract(line, ' RecoveryVersion="([^"]*)"', 1), ''), ''), '^[+-]?\\d{1,18}$$') THEN CAST(regexp_extract(line, ' RecoveryVersion="([^"]*)"', 1) AS BIGINT) END AS rv,
      |    row_number() OVER () AS rn
      |  FROM ${duckLines(XmlFixture)} WHERE line LIKE '%<Event %'
      |),
      |e_top AS (SELECT 'top_events' AS tool, 'n=' || LEAST(COUNT(*) FILTER (severity >= 30), 500) AS s, 0 AS ord FROM evx),
      |e_sev AS (
      |  SELECT 'severity_counts', string_agg(COALESCE(CAST(severity AS VARCHAR), 'null') || ':' || n, ',' ORDER BY COALESCE(severity, -2147483648) DESC), 1
      |  FROM (SELECT severity, COUNT(*) AS n FROM evx GROUP BY severity)
      |),
      |e_hist AS (
      |  SELECT 'event_histogram', string_agg(event || '=' || n, ',' ORDER BY n DESC, event), 2
      |  FROM (SELECT event, COUNT(*) AS n FROM evx GROUP BY event ORDER BY n DESC, event LIMIT 10)
      |),
      |e_span AS (
      |  SELECT 'time_span', 'n=' || COUNT(*) || ' first=' ||
      |    COALESCE(CAST(CAST(date_part('epoch', MIN(ts)) AS BIGINT) AS VARCHAR), '') || ' last=' ||
      |    COALESCE(CAST(CAST(date_part('epoch', MAX(ts)) AS BIGINT) AS VARCHAR), ''), 3
      |  FROM evx
      |),
      |e_heat AS (
      |  -- highSeverityBuckets(minSeverity=0) keeps max_severity >= 0,
      |  -- which drops buckets whose events all carry NULL severity — the
      |  -- HAVING must mirror that or an all-torn-severity bucket diverges
      |  SELECT 'bucket_heatmap', 'buckets=' || LEAST(COUNT(*), 100), 4
      |  FROM (SELECT CAST(FLOOR(date_part('epoch', ts)/300)*300 AS BIGINT) AS b FROM evx WHERE ts IS NOT NULL GROUP BY 1 HAVING MAX(severity) >= 0)
      |),
      |rb_w AS (
      |  SELECT cv, dv, rv,
      |    LAG(cv IGNORE NULLS) OVER (ORDER BY ts, rn) AS pcv,
      |    LAG(dv IGNORE NULLS) OVER (ORDER BY ts, rn) AS pdv,
      |    LAG(rv IGNORE NULLS) OVER (ORDER BY ts, rn) AS prv
      |  FROM evx WHERE cv IS NOT NULL OR dv IS NOT NULL OR rv IS NOT NULL),
      |e_roll AS (
      |  SELECT 'rollback_analysis',
      |    'detected=' || CAST((COUNT(*) FILTER (cv IS NOT NULL AND pcv IS NOT NULL AND cv < pcv)
      |      + COUNT(*) FILTER (dv IS NOT NULL AND pdv IS NOT NULL AND dv < pdv) > 0
      |      OR COUNT(*) FILTER (cv IS NOT NULL AND pcv > 1000000 AND cv < 1000000) > 0
      |      OR COUNT(*) FILTER (rv IS NOT NULL AND prv IS NOT NULL AND rv < prv) > 0) AS VARCHAR) || ' drops=' ||
      |    CAST(COUNT(*) FILTER (cv IS NOT NULL AND pcv IS NOT NULL AND cv < pcv)
      |      + COUNT(*) FILTER (dv IS NOT NULL AND pdv IS NOT NULL AND dv < pdv) AS VARCHAR), 5
      |  FROM rb_w),
      |eavf2 AS (
      |  SELECT unnest(ks) AS metric_name,
      |    COALESCE(nullif(regexp_extract(line, ' Roles="([^"]*)"', 1), ''), 'ALL') AS role,
      |    TRY_CAST(unnest(vs) AS DOUBLE) AS metric_value
      |  FROM (SELECT line, regexp_extract_all(line, '([\\w.]+)="([^"]*)"', 1) AS ks,
      |          regexp_extract_all(line, '([\\w.]+)="([^"]*)"', 2) AS vs
      |        FROM ${duckLines(XmlFixture)} WHERE line LIKE '%<Event %')
      |),
      |e_base AS (
      |  SELECT 'metric_baselines', 'n=' || LEAST(COUNT(*), 500), 6 FROM (
      |    SELECT metric_name, role FROM eavf2
      |    WHERE metric_value IS NOT NULL AND NOT isnan(metric_value)
      |      AND metric_value NOT IN ('inf'::DOUBLE, '-inf'::DOUBLE) AND abs(metric_value) < 1e308
      |      AND metric_name NOT IN $duckMandatory
      |      AND metric_name NOT IN $duckExcludedBaseline
      |    GROUP BY 1, 2 HAVING COUNT(*) >= 3)
      |),
      |e_epi AS (
      |  SELECT 'recovery_episodes', 'n=' || CASE WHEN COUNT(*) = 0 THEN 0
      |    ELSE COUNT(*) FILTER (date_part('epoch', ts) - date_part('epoch', pts) > 60) + 1 END, 7
      |  FROM (SELECT ts, LAG(ts) OVER (ORDER BY ts, rn) AS pts FROM evx
      |        WHERE event = 'MasterRecoveryState' AND ts IS NOT NULL)
      |),
      |battery AS ($duckBatterySql),
      |e_batt AS (
      |  SELECT 'detector:' || detector,
      |    'detected=' || CAST(detected AS VARCHAR) || ' n=' || CAST(count AS VARCHAR),
      |    8 + CAST(ROW_NUMBER() OVER (ORDER BY detector) - 1 AS INTEGER)
      |  FROM battery
      |),
      |bkt AS (SELECT CAST(FLOOR(date_part('epoch', ts)/300)*300 AS BIGINT) AS b, COUNT(*) AS cnt FROM evx WHERE ts IS NOT NULL GROUP BY 1),
      |bs AS (SELECT AVG(cnt) AS m, STDDEV_SAMP(cnt) AS sd FROM bkt),
      |e_hot0 AS (
      |  SELECT 'detector:zscore_hotspots' AS tool, 'n=' || LEAST(COUNT(*), 20) AS s, 14 AS ord
      |  FROM bkt, bs WHERE bs.sd IS NOT NULL AND bs.sd > 0 AND (cnt - bs.m)/bs.sd >= 2.0
      |),
      |e_hot AS (SELECT * FROM e_hot0 UNION ALL
      |  SELECT 'detector:zscore_hotspots', 'n=0', 14 WHERE NOT EXISTS (SELECT 1 FROM e_hot0)),
      |tl AS (
      |  SELECT MIN(ts) AS start_ts,
      |    MIN(ts) FILTER (COALESCE(severity, 0) >= 30) AS first_severe_ts,
      |    MIN(ts) FILTER (lag_v > 100000) AS lag100k_ts,
      |    MIN(ts) FILTER (lag_v > 1000000) AS lag1m_ts,
      |    MIN(ts) FILTER (event LIKE '%Recovery%') AS first_recovery_ts
      |  FROM evx WHERE ts IS NOT NULL),
      |e_tl AS (
      |  SELECT 'timeline', concat_ws('|',
      |    CAST(CAST(date_part('epoch', start_ts) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(date_part('epoch', first_severe_ts) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(date_part('epoch', lag100k_ts) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(date_part('epoch', lag1m_ts) AS BIGINT) AS VARCHAR),
      |    CAST(CAST(date_part('epoch', first_recovery_ts) AS BIGINT) AS VARCHAR),
      |    CASE WHEN lag100k_ts IS NOT NULL AND first_recovery_ts IS NOT NULL AND lag100k_ts <= first_recovery_ts
      |         THEN 'storage_pressure_precedes_recovery'
      |         WHEN first_recovery_ts IS NOT NULL THEN 'recovery_precedes_storage_pressure' END,
      |    CASE WHEN first_severe_ts IS NOT NULL THEN printf('+%.1fs', CAST(date_part('epoch', first_severe_ts) - date_part('epoch', start_ts) AS DOUBLE)) END,
      |    CASE WHEN lag100k_ts IS NOT NULL THEN printf('+%.1fs', CAST(date_part('epoch', lag100k_ts) - date_part('epoch', start_ts) AS DOUBLE)) END,
      |    CASE WHEN lag1m_ts IS NOT NULL THEN printf('+%.1fs', CAST(date_part('epoch', lag1m_ts) - date_part('epoch', start_ts) AS DOUBLE)) END,
      |    CASE WHEN first_recovery_ts IS NOT NULL THEN printf('+%.1fs', CAST(date_part('epoch', first_recovery_ts) - date_part('epoch', start_ts) AS DOUBLE)) END), 15
      |  FROM tl),
      |evidence AS (
      |  SELECT * FROM e_top UNION ALL SELECT * FROM e_sev UNION ALL SELECT * FROM e_hist
      |  UNION ALL SELECT * FROM e_span UNION ALL SELECT * FROM e_heat UNION ALL SELECT * FROM e_roll
      |  UNION ALL SELECT * FROM e_base UNION ALL SELECT * FROM e_epi
      |  UNION ALL SELECT * FROM e_batt UNION ALL SELECT * FROM e_hot UNION ALL SELECT * FROM e_tl
      |),
      |prompt AS (
      |  SELECT 'Question: Diagnose the FDB failure' || chr(10) ||
      |    'Current hypothesis:  (confidence 0.0)' || chr(10) ||
      |    'Events:' || chr(10) || chr(10) ||
      |    'Evidence:' || chr(10) ||
      |    string_agg(tool || ': ' || s, chr(10) ORDER BY ord) AS p
      |  FROM evidence
      |),
      |hashed AS (
      |  SELECT list_reduce(list_transform(string_split(p, ''), c -> CAST(unicode(c) AS BIGINT)),
      |    (a, b) -> (a*31 + b) % 1000000007) AS h
      |  FROM prompt
      |)""".stripMargin
  }

  lazy val sql: String =
    s"""$prelude
      |SELECT
      |  CAST(CASE WHEN h % 100 >= 80 THEN 2 ELSE -1 END AS INTEGER) AS iterations,
      |  CAST(CASE WHEN h % 100 >= 80 THEN 1 ELSE -1 END AS BIGINT) AS llm_calls,
      |  CASE WHEN h % 100 >= 80 THEN 'confidence_reached'
      |       ELSE 'ORACLE-UNDERIVED: first-call confidence below threshold' END AS stop_reason,
      |  CAST(h % 100 AS DOUBLE) / 100.0 AS confidence,
      |  'stub-' || CAST(h % 1000 AS VARCHAR) AS hypothesis
      |FROM hashed""".stripMargin

  /** Full per-iteration trace of trace_rca_loop: with the first call's
    * confidence clearing the threshold, the trace is exactly two rows —
    * the Phase A sweep and the single Phase B iteration (battery → LLM →
    * dive → confidence_reached). The dive target is re-derived with the
    * loop's own selection rule (first 10s high-severity bucket not
    * inspected by Phase A's top-10 heatmap; z-hotspots are empty here,
    * guarded), and the context-window size is the windowed event count
    * capped at the config's 200. Regime guards emit loud sentinels. */
  lazy val loopTraceSql: String =
    s"""$prelude,
      |heat10 AS (
      |  SELECT b FROM (
      |    SELECT CAST(FLOOR(date_part('epoch', ts)/300)*300 AS BIGINT) AS b,
      |      MAX(severity) AS ms
      |    FROM evx WHERE ts IS NOT NULL GROUP BY 1 HAVING MAX(severity) >= 0
      |    ORDER BY ms DESC, b LIMIT 10)
      |),
      |hotn AS (
      |  SELECT COUNT(*) AS n FROM bkt, bs
      |  WHERE bs.sd IS NOT NULL AND bs.sd > 0 AND (cnt - bs.m)/bs.sd >= 2.0
      |),
      |chosen AS (
      |  SELECT b FROM (
      |    SELECT CAST(FLOOR(date_part('epoch', ts)/10)*10 AS BIGINT) AS b,
      |      MAX(severity) AS ms
      |    FROM evx WHERE ts IS NOT NULL GROUP BY 1 HAVING MAX(severity) >= 10)
      |  WHERE b NOT IN (SELECT b FROM heat10)
      |  ORDER BY ms DESC, b LIMIT 1
      |),
      |ctx AS (
      |  SELECT LEAST(COUNT(*), 200) AS n FROM evx, chosen
      |  WHERE ts IS NOT NULL
      |    AND date_part('epoch', ts) >= chosen.b
      |    AND date_part('epoch', ts) <= chosen.b + 10
      |),
      |nsev AS (SELECT LEAST(COUNT(*) FILTER (severity >= 30), 100) AS n FROM evx),
      |guard AS (
      |  SELECT (SELECT h % 100 >= 80 FROM hashed)
      |     AND (SELECT n = 0 FROM hotn)
      |     AND EXISTS (SELECT 1 FROM chosen) AS ok
      |)
      |SELECT CAST(1 AS INTEGER) AS iteration, 'A' AS phase,
      |  false AS llm_called, CAST(0.0 AS DOUBLE) AS confidence, '' AS hypothesis,
      |  CAST(NULL AS BIGINT) AS chosen_bucket,
      |  CAST((SELECT n FROM nsev) AS BIGINT) AS n_context_events,
      |  CAST(8 AS INTEGER) AS n_evidence,
      |  CASE WHEN (SELECT ok FROM guard) THEN '' ELSE 'ORACLE-UNDERIVED' END AS stop_reason
      |UNION ALL
      |SELECT CAST(2 AS INTEGER), 'B', true,
      |  CAST(h % 100 AS DOUBLE) / 100.0,
      |  'stub-' || CAST(h % 1000 AS VARCHAR),
      |  (SELECT b FROM chosen),
      |  CAST((SELECT n FROM ctx) AS BIGINT),
      |  CAST((SELECT COUNT(*) FROM evidence) AS INTEGER),
      |  CASE WHEN (SELECT ok FROM guard) THEN 'confidence_reached'
      |       ELSE 'ORACLE-UNDERIVED: regime changed' END
      |FROM hashed
      |ORDER BY iteration""".stripMargin
}
