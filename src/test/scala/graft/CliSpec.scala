package graft

import scala.collection.mutable.ArrayBuffer

import graft.api.{ApiServer, ControlPlane}

/** The CLI against a live ApiServer — every command is a real HTTP
  * round trip (the reference's CLI stubs these out). */
class CliSpec extends SparkTestBase {

  private def fixture(): (ApiServer, ControlPlane, java.nio.file.Path) = {
    val meta = java.nio.file.Files.createTempDirectory("graft-cli")
    val runner = new ControlPlane.Runner {
      override def start(p: ControlPlane.Pipeline, s: ControlPlane.Source): Unit = ()
      override def stop(p: ControlPlane.Pipeline): Unit = ()
    }
    val cp = new ControlPlane(meta.toString, runner, connTest = _ => Right(1L))
    (new ApiServer(spark, controlPlane = Some(cp)), cp, meta)
  }

  private def runCli(srv: ApiServer, args: String*): (Int, Seq[String]) = {
    val lines = ArrayBuffer.empty[String]
    val code = Cli.run(srv.baseUri, None, args, lines += _)
    (code, lines.toSeq)
  }

  test("status, catalogs, version, help, unknown command") {
    val (srv, _, _) = fixture()
    try {
      val (c0, out0) = runCli(srv, "status")
      assert(c0 === 0)
      assert(out0.exists(_.startsWith("health:")))
      assert(out0.exists(l => l.startsWith("engine:") && l.contains("spark")))
      val (c1, out1) = runCli(srv, "catalogs")
      assert(c1 === 0 && out1.contains("spark_catalog"))
      val (c2, out2) = runCli(srv, "version")
      assert(c2 === 0 && out2.head.contains(Cli.Version))
      // keygen mints a valid 32-byte base64 key, locally
      val (kc, kout) = runCli(srv, "keygen")
      assert(kc === 0)
      assert(graft.api.CredentialCrypto.keyFromBase64(kout.head).length === 32)
      assert(runCli(srv, "help")._1 === 0)
      val (c4, out4) = runCli(srv, "frobnicate")
      assert(c4 === 1 && out4.head.contains("Unknown command"))
    } finally srv.close()
  }

  test("sources and pipelines list; start/stop actuate through the API") {
    val (srv, cp, _) = fixture()
    try {
      val src = cp.createSource("pg-main", "postgresql", "db", 5432,
        "app", "rep", "pw", "prefer", "", "")
      val p = cp.createPipeline("p1", src.id,
        Seq(("public", "users", true), ("public", "orders", true)))
      val (sc, sout) = runCli(srv, "sources")
      assert(sc === 0)
      assert(sout.exists(l => l.contains("pg-main") && l.contains(src.id)))
      val (pc, pout) = runCli(srv, "pipelines")
      assert(pc === 0)
      assert(pout.exists(l => l.contains("p1") && l.contains("2")))
      val (c1, o1) = runCli(srv, "pipelines", "start", p.id)
      assert(c1 === 0 && o1.head.endsWith("running"))
      val (c2, o2) = runCli(srv, "pipelines", "stop", p.id)
      assert(c2 === 0 && o2.head.endsWith("stopped"))
      // a start on an unknown id is a clean non-zero, not a crash
      val (c3, o3) = runCli(srv, "pipelines", "start", "ghost")
      assert(c3 === 1 && o3.head.contains("404"))
    } finally srv.close()
  }

  test("sql drains every page and reports the row count") {
    val (srv, _, _) = fixture()
    try {
      val (c, out) = runCli(srv, "sql", "SELECT id FROM range(250) ORDER BY id")
      assert(c === 0)
      assert(out.head === "id")
      assert(out.last === "(250 rows)")
      // 250 data lines between the header and the footer, in order
      val data = out.drop(1).dropRight(1)
      assert(data.size === 250)
      assert(data.head === "0" && data.last === "249")
      // a broken query is a clean non-zero with the analysis message
      val (bc, bout) = runCli(srv, "sql", "SELECT FROM nowhere")
      assert(bc === 1 && bout.head.startsWith("Error (HTTP 400)"))
      // a shell-split unquoted statement rejoins instead of baffling
      // the user with 'Unknown command'
      val (uc, uout) = runCli(srv, "sql", "SELECT", "1", "AS", "one")
      assert(uc === 0 && uout.head === "one" && uout.contains("1"))
      // bare `sql` prints its own usage, non-zero
      val (nc, nout) = runCli(srv, "sql")
      assert(nc === 1 && nout.head.contains("Usage: graft sql"))
    } finally srv.close()
  }
}
