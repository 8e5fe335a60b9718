package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end drive of the [[Cli]] dispatcher — the reference's
  * observable CLI behavior (/root/reference/aws-athena.sh:128-167,
  * aws-lambda.sh:18-35): whitelist gate, per-command argument errors
  * with help + rc 1, and each command's happy-path choreography.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def capture(args: String*): (Int, String, String) = {
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val outB = new ByteArrayOutputStream(); val errB = new ByteArrayOutputStream()
    val out = new PrintStream(outB, true, "UTF-8")
    val err = new PrintStream(errB, true, "UTF-8")
    val workDir = Files.createTempDirectory("graft-cli-spec")
    val rc = Cli.run(args.toArray, spark, out, err, workDir)
    (rc, outB.toString(StandardCharsets.UTF_8), errB.toString(StandardCharsets.UTF_8))
  }

  test("unknown command: whitelist error + help + rc 1 (aws-athena.sh:129-132)") {
    val (rc, _, err) = capture("bogus")
    assert(rc == 1)
    assert(err.contains("COMMAND is required as 1st arg: query/file/vimdiff/list/invoke/workgroups"))
    assert(err.contains("query [query string] ... execution and get result the query"))
    assert(err.contains("invoke [lambda function name] [json format payload] ... invoke lambda function"))
  }

  test("no command at all takes the same whitelist path") {
    val (rc, _, err) = capture()
    assert(rc == 1 && err.contains("COMMAND is required as 1st arg"))
  }

  test("query without a sentence: exact error + help + rc 1 (aws-athena.sh:135-138)") {
    val (rc, _, err) = capture("query")
    assert(rc == 1)
    assert(err.contains("Error: query requires second arg: query sentence"))
  }

  test("query happy path: id echo, succeeded banner, aligned result (aws-athena.sh:36,43,141)") {
    val (rc, out, _) = capture("query",
      "SELECT n_name FROM nation WHERE n_nationkey < 2 ORDER BY n_nationkey")
    assert(rc == 0)
    assert(out.contains("Query Execution ID: "))
    assert(out.contains("Query succeeded. Fetching results..."))
    assert(out.contains("n_name"))
    assert(out.contains("NATION_0") && out.contains("NATION_1"))
  }

  test("query accepts the reference's Trino dialect (double-quoted identifiers)") {
    val (rc, out, _) = capture("query",
      """SELECT count("n_name") AS n FROM nation""")
    assert(rc == 0)
    assert(out.contains("25"))
  }

  test("query submit-time analysis error: start-execution error + rc 1 (aws-athena.sh:29-32)") {
    val (rc, _, err) = capture("query", "SELECT x FROM no_such_table_anywhere")
    assert(rc == 1)
    assert(err.contains("Error starting query execution:"))
  }

  test("query runtime failure: 'Query failed.' + reason to stderr + rc 1 (aws-athena.sh:50-53)") {
    val (rc, _, err) = capture("query", "SELECT 1/0 AS x") // ANSI: fails at run, not analysis
    assert(rc == 1)
    assert(err.contains("Query failed."))
  }

  test("file requires a .sql suffix (aws-athena.sh:146-149), empty arg included") {
    for (bad <- Seq(Seq("file"), Seq("file", "query.txt"))) {
      val (rc, _, err) = capture(bad: _*)
      assert(rc == 1)
      assert(err.contains("Error: file requires second arg: .sql file"))
    }
  }

  test("file happy path reads and runs the .sql file (aws-athena.sh:151-156)") {
    val f = Files.createTempFile("graft-cli", ".sql")
    Files.writeString(f, "SELECT count(*) AS n FROM region")
    val (rc, out, _) = capture("file", f.toString)
    assert(rc == 0)
    assert(out.contains("Query succeeded. Fetching results..."))
    assert(out.contains("5"))
  }

  test("vimdiff argument gates: missing args, then dot-format check (aws-athena.sh:162-168)") {
    val (rc1, _, err1) = capture("vimdiff", "spark_catalog.default.nation")
    assert(rc1 == 1)
    assert(err1.contains("Error: vimdiff requires second and third arg: Athena database_name.table_name"))
    val (rc2, _, err2) = capture("vimdiff", "nodots", "alsonodots")
    assert(rc2 == 1)
    assert(err2.contains("Error: Arguments must be in the format 'catalog_name.database_name.table_name' and contain dot (.)"))
  }

  test("vimdiff happy path writes base_result.tsv/target_result.tsv (aws-athena.sh:194-195)") {
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val outB = new ByteArrayOutputStream(); val errB = new ByteArrayOutputStream()
    val workDir = Files.createTempDirectory("graft-cli-vimdiff")
    val rc = Cli.run(
      Array("vimdiff", "spark_catalog.default.nation", "spark_catalog.default.nation"),
      spark, new PrintStream(outB, true, "UTF-8"), new PrintStream(errB, true, "UTF-8"), workDir)
    assert(rc == 0)
    assert(Files.exists(workDir.resolve("base_result.tsv")))
    assert(Files.exists(workDir.resolve("target_result.tsv")))
    // identical tables → identical renders, and no differing cells
    assert(Files.readString(workDir.resolve("base_result.tsv")) ==
      Files.readString(workDir.resolve("target_result.tsv")))
  }

  test("vimdiff failure attributes the side, reference message (aws-athena.sh:183-190)") {
    val (rc, _, err) = capture("vimdiff",
      "spark_catalog.default.no_such_table", "spark_catalog.default.nation")
    assert(rc == 1)
    assert(err.contains("Failed on the table provided as the second argument."))
  }

  test("list prints one function name per line (aws-lambda.sh:38-40)") {
    val (rc, out, _) = capture("list")
    assert(rc == 0)
    assert(out.linesIterator.toSeq.contains("echo"))
    assert(out.linesIterator.toSeq.contains("upcase_values"))
  }

  test("invoke argument gates, in the reference's order (aws-lambda.sh:25-34)") {
    val (rc1, _, err1) = capture("invoke")
    assert(rc1 == 1 && err1.contains("invoke requires second arg: lambda function name"))
    val (rc2, _, err2) = capture("invoke", "echo")
    assert(rc2 == 1 && err2.contains("invoke requires third arg: lambda payload json"))
    val (rc3, _, err3) = capture("invoke", "echo", "{not json")
    assert(rc3 == 1 && err3.contains("third arg json format invalid"))
    // the json gate exits WITHOUT help (aws-lambda.sh:33 is a bare exit 1)
    assert(!err3.contains("wrapper command"))
  }

  test("invoke happy path renders the two-header choreography (aws-lambda.sh:46-51)") {
    val (rc, out, _) = capture("invoke", "upcase_values", """{"a": "hi"}""")
    assert(rc == 0)
    assert(out.contains("AWS CLI Output:"))
    assert(out.contains("Lambda Response:"))
    assert(out.contains("\"HI\""))
  }

  test("workgroups renders the banner + fixed-width report choreography (aws-athena-workgroup.sh:8-58)") {
    val (rc, out, _) = capture("workgroups")
    assert(rc == 0)
    assert(out.contains("--- 🛠️ Athena ワークグループ設定の確認を開始します ---"))
    assert(out.contains("ワークグループ名"))
    assert(out.contains("primary"))
    assert(out.contains("設定なし (Default使用)"))
    assert(out.contains("--- ✅ 設定の抽出を完了しました ---"))
  }

  test("workgroups honors an injected ATHENA_WORKGROUP (non-primary branch)") {
    // the env lookup is a run() parameter (defaulting to sys.env), so
    // the non-primary registration path is drivable without mutating
    // the JVM environment
    graft.catalog.Tables.register(spark, TestSpark.sfDir)
    val outB = new ByteArrayOutputStream()
    val out = new PrintStream(outB, true, "UTF-8")
    val rc = Cli.run(Array("workgroups"), spark, out, out,
      Files.createTempDirectory("graft-cli-wg"),
      env = Map("ATHENA_WORKGROUP" -> "analytics_team").get)
    val rendered = outB.toString(StandardCharsets.UTF_8)
    assert(rc == 0)
    assert(rendered.contains("analytics_team"))
    assert(rendered.contains("primary")) // the default group still reports
  }

  test("invoke with an unknown function: error + rc 1") {
    val (rc, _, err) = capture("invoke", "no_such_fn", "{}")
    assert(rc == 1)
    assert(err.contains("Function not found: no_such_fn"))
  }
}
