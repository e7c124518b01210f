package graft

import graft.pipeline.OracleDialect.toSparkSql
import org.scalatest.funsuite.AnyFunSuite

class OracleDialectSpec extends AnyFunSuite {

  test("dbms_lob.substr swaps Oracle's (lob, amount, offset) into Spark's " +
    "(str, pos, len), with defaults for the short forms") {
    assert(toSparkSql("SELECT dbms_lob.substr(c, 10, 3) FROM t") ==
      "SELECT substring(c, 3, 10) FROM t")
    assert(toSparkSql("SELECT DBMS_LOB.SUBSTR(c, 10) FROM t") ==
      "SELECT substring(c, 1, 10) FROM t")
    assert(toSparkSql("SELECT dbms_lob.substr(c) FROM t") ==
      "SELECT substring(c, 1, 32767) FROM t")
  }

  test("nested calls rewrite inside-out: the reference's CLOB extraction " +
    "idiom substr(q, getlength(q), 1) (incremental.sh:64)") {
    assert(toSparkSql(
      "SELECT dbms_lob.substr(SOURCE_QUERY, dbms_lob.getlength(SOURCE_QUERY), 1) FROM TESTING_QUERIES") ==
      "SELECT substring(SOURCE_QUERY, 1, cast(length(SOURCE_QUERY) as bigint)) FROM TESTING_QUERIES")
  }

  test("commas and parens inside string-literal arguments don't split args") {
    assert(toSparkSql("SELECT dbms_lob.substr(concat(a, ',('), 2, 1) FROM t") ==
      "SELECT substring(concat(a, ',('), 1, 2) FROM t")
  }

  test("sysdate rewrites as a bare word only, never inside literals or " +
    "identifiers") {
    assert(toSparkSql("SELECT sysdate, SYSDATE FROM dual") ==
      "SELECT current_timestamp, current_timestamp FROM dual")
    assert(toSparkSql("SELECT 'sysdate rules' AS s, my_sysdate_col FROM t") ==
      "SELECT 'sysdate rules' AS s, my_sysdate_col FROM t")
  }

  test("TO_DATE format masks map to java.time patterns (the reference's " +
    "stamp shape, KafkaScript_ConformToStaging.sh)") {
    assert(toSparkSql("TO_DATE('2024-01-02 13:04:05','YYYY-MM-DD HH24:MI:SS')") ==
      "to_timestamp('2024-01-02 13:04:05', 'yyyy-MM-dd HH:mm:ss')")
    assert(toSparkSql("to_date('2024-01-02','YYYY-MM-DD')") ==
      "to_timestamp('2024-01-02', 'yyyy-MM-dd')")
  }

  test("trailing ROWNUM predicates become LIMIT; unsupported shapes throw") {
    assert(toSparkSql("SELECT * FROM (SELECT a FROM t ORDER BY a) WHERE ROWNUM <= 5") ==
      "SELECT * FROM (SELECT a FROM t ORDER BY a)  LIMIT 5")
    assert(toSparkSql("SELECT a FROM t WHERE a > 0 AND rownum < 4") ==
      "SELECT a FROM t WHERE a > 0  LIMIT 3")
    // not trailing → must throw, never silently change semantics
    intercept[IllegalArgumentException] {
      toSparkSql("SELECT a FROM t WHERE ROWNUM <= 4 AND a > 0")
    }
    intercept[IllegalArgumentException] {
      toSparkSql("SELECT ROWNUM, a FROM t")
    }
  }

  test("Oracle (+) outer joins are rejected with guidance") {
    val e = intercept[IllegalArgumentException] {
      toSparkSql("SELECT * FROM a, b WHERE a.id = b.id (+)")
    }
    assert(e.getMessage.contains("ANSI"))
  }

  test("Spark-dialect text passes through unchanged (the shim is safe to " +
    "apply unconditionally)") {
    val spark = Seq(
      "SELECT nvl(a, 0), listagg(b, ',') WITHIN GROUP (ORDER BY b) FROM t GROUP BY c",
      "SELECT x FROM t WHERE d >= to_timestamp('2024-01-01', 'yyyy-MM-dd')",
      "SELECT a FROM t1 MINUS SELECT a FROM t2")
    spark.foreach(s => assert(toSparkSql(s) == s, s))
  }

  test("SQL comments are masked: an apostrophe or Oracle-ism inside them " +
    "neither inverts the literal state nor triggers/blocks rewrites") {
    // an apostrophe in a line comment must not swallow the rewrite after it
    assert(toSparkSql("SELECT a, -- don't touch this row\n sysdate FROM t") ==
      "SELECT a, -- don't touch this row\n current_timestamp FROM t")
    // a commented-out (+) must not reject the query
    assert(toSparkSql("SELECT a /* legacy: b.id (+) = a.id */, sysdate FROM t") ==
      "SELECT a /* legacy: b.id (+) = a.id */, current_timestamp FROM t")
    // Oracle-isms INSIDE comments stay verbatim
    assert(toSparkSql("SELECT a FROM t -- sysdate stamp here") ==
      "SELECT a FROM t -- sysdate stamp here")
    assert(toSparkSql("SELECT a /* to_date(x,'YYYY') */ FROM t") ==
      "SELECT a /* to_date(x,'YYYY') */ FROM t")
    // and a genuine in-literal apostroph–comment interleave still rewrites
    assert(toSparkSql("SELECT 'it''s' AS s, sysdate FROM t -- ok") ==
      "SELECT 'it''s' AS s, current_timestamp FROM t -- ok")
  }

  test("hasOracleDateMask fires on exec-time-only Oracle masks and never " +
    "on Spark masks, bare calls, or masked text") {
    import graft.pipeline.OracleDialect.hasOracleDateMask
    assert(hasOracleDateMask("SELECT to_date(c, 'YYYY-MM-DD') FROM t"))
    assert(hasOracleDateMask("SELECT TO_DATE(c,'DD-MON-RRRR HH24:MI') FROM t"))
    assert(!hasOracleDateMask("SELECT to_date(c, 'yyyy-MM-dd') FROM t"))
    assert(!hasOracleDateMask("SELECT to_date(c) FROM t"))
    assert(!hasOracleDateMask("SELECT 'to_date(x,''YYYY-MM-DD'')' FROM t"))
    assert(!hasOracleDateMask("SELECT a /* to_date(x,'YYYY') */ FROM t"))
  }

  test("the q240 stored text rewrites to runnable Spark SQL") {
    val rewritten = toSparkSql(Queries.OracleDialectSql)
    assert(rewritten.contains("substring(c_mktsegment, 1, 4)"))
    assert(rewritten.contains("cast(length(c_name) as bigint)"))
    assert(rewritten.contains("to_timestamp('1995-06-01 12:30:45', 'yyyy-MM-dd HH:mm:ss')"))
    assert(rewritten.contains("current_timestamp"))
    assert(rewritten.trim.endsWith("LIMIT 3"))
    assert(!rewritten.toLowerCase.contains("rownum") &&
      !rewritten.toLowerCase.contains("dbms_lob") &&
      !rewritten.toLowerCase.contains("sysdate"))
  }

  test("end-to-end: the Oracle-dialect text executes and matches its ANSI " +
    "twin row for row") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val got = Queries.oracleDialectStored(spark, dir)
      .collect().map(_.toSeq).toSeq
    val twin = spark.sql(
      """SELECT substring(c_mktsegment, 1, 4) AS seg4,
        |       count(*) AS n_custs,
        |       coalesce(max(length(c_name)), 0) AS max_comment_len
        |FROM customer GROUP BY 1 ORDER BY seg4 LIMIT 3""".stripMargin)
      .collect().map(_.toSeq).toSeq
    assert(got == twin && got.size == 3, s"$got vs $twin")
  }
}
