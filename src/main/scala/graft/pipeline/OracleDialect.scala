package graft.pipeline

/** Oracle→Spark SQL pre-parse shim for the reference's stored query texts.
  *
  * The reference stores its queries as data — Oracle CLOBs in
  * TESTING_QUERIES (`incremental.sh:63-67`), `:`-separated rows in
  * `query.txt` — and most of their constructs (NVL, MINUS, LISTAGG,
  * CASE, IN, scalar subqueries) parse in Spark 4 verbatim. The residue
  * that does NOT is rewritten here, so [[StageRunner.runJob]] can execute
  * the stored texts drop-in:
  *
  *  - `dbms_lob.substr(lob, amount, offset)` → `substring(lob, offset,
  *    amount)` (note the ARGUMENT ORDER swap; 2-arg and 1-arg forms get
  *    Oracle's defaults amount=32767, offset=1) — the reference extracts
  *    every stored CLOB this way (`incremental.sh:64`).
  *  - `dbms_lob.getlength(lob)` → `cast(length(lob) as bigint)` (Oracle
  *    returns NUMBER — unbounded — so the widening is dialect-faithful).
  *  - `sysdate` → `current_timestamp` (43 uses across the reference's
  *    audit inserts).
  *  - `TO_DATE('<lit>', '<fmt>')` → `to_timestamp('<lit>', '<java fmt>')`
  *    with the Oracle format tokens mapped (YYYY→yyyy, DD→dd, HH24→HH,
  *    MI→mm, SS→ss; `TO_DATE('$currentdate','YYYY-MM-DD HH24:MI:SS')` is
  *    the reference's stamp shape, `KafkaScript_ConformToStaging.sh`).
  *  - the Oracle top-k idiom `WHERE ROWNUM <= k` / `AND ROWNUM <= k` →
  *    predicate removed, ` LIMIT k` appended to its query string. Only
  *    the trailing-predicate shape is supported (the reference's and the
  *    classic `SELECT * FROM (… ORDER BY …) WHERE ROWNUM <= k` pagination
  *    shape); any other ROWNUM use throws rather than silently changing
  *    semantics (Oracle assigns ROWNUM before ORDER BY — only the
  *    subquery-wrapped idiom is order-safe to translate).
  *  - Oracle's pre-ANSI `(+)` outer-join marker is REJECTED with
  *    guidance (rewriting it correctly requires join-graph analysis, and
  *    the reference uses ANSI joins throughout).
  *
  * The rewrites are textual but QUOTE-AWARE (string literals are never
  * touched) and paren-balanced (nested calls inside `dbms_lob.substr`
  * arguments split correctly). Typical Spark-dialect text passes through
  * unchanged; the pathological cases a textual shim cannot distinguish —
  * a Spark query whose COLUMNS are literally named `sysdate`/`rownum` —
  * are handled one level up: [[StageRunner.runJob]] dispatches
  * TRY-SPARK-FIRST, so the shim only ever sees texts Spark itself
  * rejected, and valid Spark SQL is never rewritten out from under its
  * author.
  */
object OracleDialect {

  def toSparkSql(sql: String): String = {
    // quote-aware: a '(+)' INSIDE a string literal (e.g. a regex argument)
    // is data, not the Oracle join marker
    locally {
      val mask = literalMask(sql)
      var idx = sql.indexOf("(+)")
      while (idx >= 0) {
        require(mask(idx),
          "Oracle (+) outer-join syntax is not translatable textually — " +
            "rewrite the stored query with ANSI LEFT/RIGHT OUTER JOIN")
        idx = sql.indexOf("(+)", idx + 1)
      }
    }
    var s = sql
    s = rewriteDbmsLob(s)
    s = rewriteToDate(s)
    s = replaceBareWord(s, "sysdate", "current_timestamp")
    s = rewriteRownum(s)
    s
  }

  // --- helpers ---------------------------------------------------------

  /** Positions inside single-quoted string literals (Oracle's only string
    * quoting; '' is an escaped quote and stays inside the literal) OR
    * inside SQL comments (`--` to end-of-line, slash-star block comments).
    * Comments must be masked alongside literals: an apostrophe inside a
    * comment ("-- don't rewrite") is not a quote, and without skipping
    * comments it would invert the literal state for the rest of the text —
    * silently disabling rewrites after it, or mis-flagging a commented-out
    * `(+)`. Stored Oracle CLOB queries commonly carry comments.
    */
  private def literalMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c == '\'') {
        // string literal: mask through the closing quote; '' stays inside
        mask(i) = true; i += 1
        var closed = false
        while (i < s.length && !closed) {
          mask(i) = true
          if (s(i) == '\'') {
            if (i + 1 < s.length && s(i + 1) == '\'') { mask(i + 1) = true; i += 2 }
            else { closed = true; i += 1 }
          } else i += 1
        }
      } else if (c == '-' && i + 1 < s.length && s(i + 1) == '-') {
        while (i < s.length && s(i) != '\n') { mask(i) = true; i += 1 }
      } else if (c == '/' && i + 1 < s.length && s(i + 1) == '*') {
        mask(i) = true; mask(i + 1) = true; i += 2
        var closed = false
        while (i < s.length && !closed) {
          if (s(i) == '*' && i + 1 < s.length && s(i + 1) == '/') {
            mask(i) = true; mask(i + 1) = true; i += 2; closed = true
          } else { mask(i) = true; i += 1 }
        }
      } else { i += 1 }
    }
    mask
  }

  /** Case-insensitive whole-word replace outside string literals. */
  private def replaceBareWord(s: String, word: String, to: String): String = {
    val mask = literalMask(s)
    val re = ("(?i)\\b" + java.util.regex.Pattern.quote(word) + "\\b").r
    val sb = new StringBuilder
    var last = 0
    for (m <- re.findAllMatchIn(s)) {
      if (!mask(m.start)) {
        sb.append(s.substring(last, m.start)).append(to)
        last = m.end
      }
    }
    sb.append(s.substring(last)).toString
  }

  /** Find `func(`, return (callStart, argStart) pairs outside literals. */
  private def callSites(s: String, func: String): List[(Int, Int)] = {
    val mask = literalMask(s)
    val re = ("(?i)\\b" + java.util.regex.Pattern.quote(func) + "\\s*\\(").r
    re.findAllMatchIn(s).filter(m => !mask(m.start))
      .map(m => (m.start, m.end)).toList
  }

  /** Split the argument list starting right after the '(' at `argStart`;
    * returns (args, indexAfterClosingParen). Quote- and paren-aware.
    */
  private def splitArgs(s: String, argStart: Int): (List[String], Int) = {
    val args = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 1
    var in = false
    var i = argStart
    while (i < s.length && depth > 0) {
      val c = s(i)
      if (c == '\'') { in = !in; cur.append(c) }
      else if (in) cur.append(c)
      else c match {
        case '(' => depth += 1; cur.append(c)
        case ')' =>
          depth -= 1; if (depth > 0) cur.append(c)
        case ',' if depth == 1 => args += cur.result().trim; cur.clear()
        case _ => cur.append(c)
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parentheses in: ${s.drop(argStart).take(80)}")
    if (cur.result().trim.nonEmpty || args.nonEmpty) args += cur.result().trim
    (args.toList, i)
  }

  /** Rewrite calls of `func` via `render(args)` (None = leave the call
    * verbatim). Sites are located once and processed RIGHT-TO-LEFT, so a
    * rewrite never invalidates the indices of sites to its left and a
    * nested same-function call (always to the right of its encloser's
    * start) is rewritten first.
    */
  private def rewriteCalls(s0: String, func: String)
                          (render: List[String] => Option[String]): String = {
    var s = s0
    callSites(s0, func).reverse.foreach { case (start, argStart) =>
      val (args, end) = splitArgs(s, argStart)
      render(args).foreach { r =>
        s = s.substring(0, start) + r + s.substring(end)
      }
    }
    s
  }

  private def rewriteDbmsLob(s0: String): String = {
    val a = rewriteCalls(s0, "dbms_lob.getlength") { args =>
      require(args.length == 1, s"dbms_lob.getlength takes 1 arg, got $args")
      Some(s"cast(length(${args.head}) as bigint)")
    }
    rewriteCalls(a, "dbms_lob.substr") { args =>
      require(args.nonEmpty && args.length <= 3,
        s"dbms_lob.substr takes 1-3 args, got $args")
      val lob = args.head
      val amount = args.lift(1).getOrElse("32767")
      val offset = args.lift(2).getOrElse("1")
      Some(s"substring($lob, $offset, $amount)") // Oracle (lob, AMOUNT, OFFSET)
    }
  }

  /** Oracle datetime format → java.time pattern (longest token first so
    * HH24 wins over HH, MI over M-anything).
    */
  private val fmtTokens: Seq[(String, String)] = Seq(
    "HH24" -> "HH", "HH12" -> "hh", "YYYY" -> "yyyy", "RRRR" -> "yyyy",
    "MON" -> "MMM", "MI" -> "mm", "SS" -> "ss", "DD" -> "dd", "HH" -> "hh",
    "MM" -> "MM")

  private def mapFormat(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      fmtTokens.find { case (o, _) =>
        fmt.regionMatches(true, i, o, 0, o.length)
      } match {
        case Some((o, j)) => sb.append(j); i += o.length
        case None => sb.append(fmt(i)); i += 1
      }
    }
    sb.result()
  }

  /** A format mask is treated as Oracle-dialect only when it is ALL
    * UPPERCASE (Oracle masks are case-insensitive and conventionally
    * upper; java.time patterns are case-SENSITIVE and conventionally
    * mixed) and carries at least one Oracle-specific token. Anything else
    * — including a Spark-dialect `to_date(x, 'yyyy-MM-dd')` — passes
    * through verbatim: rewriting a java pattern's `mm`/`HH` would
    * silently change minutes to months, so the gate errs on not touching.
    */
  private def looksOracleFormat(fmt: String): Boolean =
    fmt == fmt.toUpperCase(java.util.Locale.ROOT) &&
      // Oracle-DISTINCTIVE tokens only: 'DD' alone is excluded because it
      // is also a valid java.time pattern (day-of-year) — an all-caps
      // Spark to_date(x, 'DD') must pass through, not be silently turned
      // into day-of-month
      Seq("YYYY", "RRRR", "HH24", "HH12", "MI", "MON").exists(fmt.contains)

  /** True when the text carries a `to_date(..., 'MASK')` whose mask is
    * Oracle-dialect per [[looksOracleFormat]]. Such a text is the one
    * Oracle-ism Spark accepts at PARSE and ANALYZE time and rejects only
    * at EXECUTION (week-based 'Y' / day-of-year 'D' java.time pattern
    * rejection under the default datetime policy) — so try-Spark-first
    * dispatch never routes it through the shim and the stage fails at run
    * time instead of migrating drop-in. Callers pre-scan with this and
    * shim FIRST when it fires; the gate inherits [[looksOracleFormat]]'s
    * conservatism (all-uppercase + an Oracle-distinctive token), so valid
    * Spark masks are never intercepted.
    */
  def hasOracleDateMask(s: String): Boolean =
    scala.util.Try {
      callSites(s, "to_date").exists { case (_, argStart) =>
        splitArgs(s, argStart)._1.lift(1).map(_.trim).exists(f =>
          f.startsWith("'") && f.endsWith("'") &&
            looksOracleFormat(f.substring(1, f.length - 1)))
      }
    }.getOrElse(false)

  private def rewriteToDate(s0: String): String =
    rewriteCalls(s0, "to_date") { args =>
      val fmtLit = args.lift(1).map(_.trim)
        .filter(f => f.startsWith("'") && f.endsWith("'"))
        .map(f => f.substring(1, f.length - 1))
      fmtLit.filter(looksOracleFormat).map { fmt =>
        s"to_timestamp(${args.head}, '${mapFormat(fmt)}')"
      } // non-Oracle mask (or no literal mask) → Spark parses it natively
    }

  private val rownumTail =
    """(?is)\b(where|and)\s+rownum\s*(<=|<)\s*(\d+)\s*""".r

  private def rewriteRownum(s0: String): String = {
    val mask = literalMask(s0)
    val hits = "(?i)\\browNum\\b".r.findAllMatchIn(s0)
      .filter(m => !mask(m.start)).toList
    if (hits.isEmpty) return s0
    val m = rownumTail.findAllMatchIn(s0).filter(x => !mask(x.start)).toList
    require(hits.length == 1 && m.length == 1,
      "only a single trailing `WHERE/AND ROWNUM <= k` predicate is " +
        "translatable to LIMIT; restructure the stored query otherwise")
    val hit = m.head
    val k0 = hit.group(3).toLong
    val k = if (hit.group(2) == "<") k0 - 1 else k0
    // the predicate must be the FINAL clause of the OUTERMOST query:
    // appending LIMIT is only equivalent there (inside a subquery the
    // LIMIT would escape its scope; followed by AND'd predicates the
    // removal would strand them)
    require(s0.substring(hit.end).isBlank,
      "ROWNUM predicate must end the outermost query for the LIMIT " +
        s"translation; found trailing text: ${s0.substring(hit.end).take(60)}")
    s0.substring(0, hit.start) + s" LIMIT $k"
  }
}
