package graft.oracle

/** Generated DuckDB mirror of the batched real-vocab BPE fit
  * ([[graft.text.Bpe.fitMergesBatched]]) — the oracle UNROLLS the
  * training loop: one (pair-count -> top-N rank -> symbol-disjoint keep
  * -> fold-replace rewrite) CTE block per stage, all MATERIALIZED so the
  * binder never inlines the chain exponentially. Everything is derived
  * from the parquet corpus inside the query; nothing Spark-computed
  * leaks in.
  *
  * Cost note (measured, DuckDB 1.0): the chain is planner-bound — cost
  * grows superlinearly with STAGE COUNT, not dictionary size — which is
  * why the fit is batched (top-8 symbol-disjoint merges per stage, the
  * production-trainer shape) rather than one merge per stage: 96 stages
  * ≈ 8 s and yield 300+ merges, where 256 single-merge stages took
  * ~107 s. The per-stage rewrite folds the kept merges with ONE
  * list_reduce instead of eight nested scalar-subquery replaces — that
  * alone cut the planner cost ~4×.
  */
object DuckBpe {

  /** Units CTE d0: non-overlapping adjacent word pairs joined by '_'
    * (odd tail = single word), counted and capped top-`capK` by
    * (freq desc, unit) — the vocab²-bounded dictionary the fit runs on.
    * `wordsListSql` must evaluate to the canonical VARCHAR[] words of
    * `documents.text`.
    */
  def dictCte(wordsListSql: String, capK: Int): String =
    s"""d0 AS MATERIALIZED (
       |  SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS tokstr, n FROM (
       |    SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM (
       |      SELECT unnest(list_transform(generate_series(1, (len(ws)+1)//2),
       |        i -> CASE WHEN 2*i <= len(ws) THEN ws[2*i-1] || '_' || ws[2*i] ELSE ws[2*i-1] END)) AS w
       |      FROM (SELECT $wordsListSql AS ws FROM documents) WHERE len(ws) > 0)
       |    GROUP BY 1 ORDER BY n DESC, w LIMIT $capK))""".stripMargin

  /** The full fit chain: d0 + one (t_i, k_i, d_i) block per stage.
    * t_i = top-`topN` pairs by (count desc, a, b); k_i = the
    * symbol-disjoint kept subset (a pair survives iff NO higher-ranked
    * pair of the same window shares a symbol with it — the
    * non-recursive rule both engines evaluate identically); d_i = the
    * dictionary with k_i's merges applied in rank order via one
    * list_reduce fold of "|a||b|" -> "|ab|" replaces.
    */
  def fitCtes(wordsListSql: String, stages: Int, topN: Int, capK: Int = 65536): String = {
    val parts = scala.collection.mutable.ListBuffer[String](dictCte(wordsListSql, capK))
    for (i <- 1 to stages) {
      parts += s"""t$i AS MATERIALIZED (
         |  SELECT a, b, c, row_number() OVER (ORDER BY c DESC, a, b) AS rn FROM (
         |    SELECT u.a AS a, u.b AS b, CAST(SUM(n) AS BIGINT) AS c FROM (
         |      SELECT n, unnest(list_transform(generate_series(1, len(tk) - 1),
         |        j -> {'a': tk[j], 'b': tk[j+1]})) AS u
         |      FROM (SELECT string_split(trim(tokstr, '|'), '||') AS tk, n FROM d${i - 1}))
         |    GROUP BY 1, 2)
         |  QUALIFY rn <= $topN)""".stripMargin
      parts += s"""k$i AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY t.rn) AS krn, t.a, t.b, t.c
         |  FROM t$i t
         |  WHERE NOT EXISTS (SELECT 1 FROM t$i q
         |    WHERE q.rn < t.rn AND (q.a IN (t.a, t.b) OR q.b IN (t.a, t.b))))""".stripMargin
      parts += s"""d$i AS MATERIALIZED (
         |  SELECT w, list_reduce([tokstr] ||
         |      (SELECT COALESCE(list(('|'||a||'||'||b||'|') || chr(1) || ('|'||a||b||'|') ORDER BY krn), []) FROM k$i),
         |    (acc, e) -> replace(acc, string_split(e, chr(1))[1], string_split(e, chr(1))[2])) AS tokstr, n
         |  FROM d${i - 1})""".stripMargin
    }
    parts.mkString(",\n")
  }

  /** The merge-table projection over a built chain: global step order =
    * (stage, krn).
    */
  def mergesSelect(stages: Int): String = {
    val union = (1 to stages)
      .map(i => s"SELECT $i AS stage, krn, a, b, c AS weight FROM k$i")
      .mkString(" UNION ALL ")
    s"""SELECT CAST(row_number() OVER (ORDER BY stage, krn) AS BIGINT) AS step,
       |  CAST(stage AS BIGINT) AS stage, a, b, weight
       |FROM ($union) ORDER BY step""".stripMargin
  }

  /** Per-unit encoded token counts off the final dictionary: tokens =
    * delimiter bars / 2.
    */
  def tokCountsCte(stages: Int): String =
    s"""tc AS MATERIALIZED (
       |  SELECT w, CAST((length(tokstr) - length(replace(tokstr, '|', ''))) // 2 AS BIGINT) AS btoks
       |  FROM d$stages)""".stripMargin
}
