package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Command-line client for a running [[Serve]] instance — the
  * reference ships the same tool as `philotes` (ref cmd/philotes-cli/
  * main.go: version/status/pipelines scaffolding whose status and
  * pipeline actions are "not yet implemented" stubs, main.go:69-75);
  * here every command is live against the HTTP API:
  *
  * {{{
  *   graft.Cli status                  # /query/health + /query/status
  *   graft.Cli catalogs                # /query/catalogs
  *   graft.Cli sources                 # /api/v1/sources
  *   graft.Cli pipelines               # /api/v1/pipelines
  *   graft.Cli pipelines start <id>    # actuate through the control plane
  *   graft.Cli pipelines stop <id>
  *   graft.Cli sql "SELECT ..."        # /query/sql, pages drained to EOF
  * }}}
  *
  * Config is environment-first like the reference's `config.Load`:
  * `GRAFT_API_URL` (required), `GRAFT_TOKEN` (bearer, optional).
  * Exit code 0 on success, 1 on any HTTP/usage error. Pure JDK HTTP —
  * no SparkSession starts for a CLI call. */
object Cli {

  val Version = "0.13.0"

  private val usage =
    """graft - CDC lake engine management
      |
      |Usage: graft <command> [options]
      |
      |Commands:
      |  version                    Show version information
      |  status                     Engine health + query-layer status
      |  catalogs                   Registered catalogs
      |  sources                    List CDC sources
      |  pipelines                  List pipelines
      |  pipelines start <id>       Start a pipeline (live WAL tail)
      |  pipelines stop <id>        Stop a pipeline
      |  sql <query>                Run SQL, print all result pages
      |  keygen                     Mint a GRAFT_ENCRYPTION_KEY (local, no API)
      |  help                       This message
      |
      |Environment: GRAFT_API_URL (required except keygen), GRAFT_TOKEN (optional)""".stripMargin

  /** Testable core: returns the exit code, emits lines through `out`. */
  def run(base: String, token: Option[String], args: Seq[String],
          out: String => Unit): Int = {
    val http = HttpClient.newHttpClient()

    def call(method: String, path: String,
             body: Option[String] = None): (Int, JValue) = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
        .header("Content-Type", "application/json")
      token.foreach(t => b.header("Authorization", s"Bearer $t"))
      val req = (method match {
        case "GET"  => b.GET()
        case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(
          body.getOrElse(""), UTF_8))
        case m => b.method(m, HttpRequest.BodyPublishers.noBody())
      }).build()
      val r = http.send(req, HttpResponse.BodyHandlers.ofString())
      val parsed =
        if (r.body() == null || r.body().isEmpty) JNothing
        else try JsonMethods.parse(r.body()) catch { case _: Throwable => JNothing }
      (r.statusCode(), parsed)
    }

    def str(j: JValue): String = j match {
      case JString(s)  => s
      case JInt(n)     => n.toString
      case JBool(b)    => b.toString
      case JDouble(d)  => d.toString
      case JDecimal(d) => d.toString
      case JNull       => "null"
      case JNothing    => ""
      case other       => JsonMethods.compact(JsonMethods.render(other))
    }

    def fail(code: Int, j: JValue): Int = {
      out(s"Error (HTTP $code): ${str(j \ "error")}")
      1
    }

    args.toList match {
      case Nil | ("help" | "-h" | "--help") :: _ =>
        out(usage); 0

      case ("version" | "-v" | "--version") :: _ =>
        out(s"graft version $Version"); 0

      case "keygen" :: _ =>
        // a fresh AES-256 key for credential encryption at rest —
        // purely local, no API round trip
        out(graft.api.CredentialCrypto.generateKeyBase64()); 0

      case "status" :: _ =>
        val (hc, hb) = call("GET", "/query/health")
        if (hc != 200) return fail(hc, hb)
        val (sc, sb) = call("GET", "/query/status")
        if (sc != 200) return fail(sc, sb)
        out(s"health:          ${str(hb \ "status")}")
        out(s"engine:          ${str(sb \ "engine")} ${str(sb \ "engine_version")}")
        out(s"available:       ${str(sb \ "available")}")
        out(s"uptime:          ${str(sb \ "uptime")}")
        out(s"active workers:  ${str(sb \ "active_workers")}")
        out(s"running queries: ${str(sb \ "running_queries")}")
        0

      case "catalogs" :: _ =>
        val (c, b) = call("GET", "/query/catalogs")
        if (c != 200) return fail(c, b)
        b \ "catalogs" match {
          case JArray(cs) => cs.foreach(x => out(str(x \ "name")))
          case _          => ()
        }
        0

      case "sources" :: _ =>
        val (c, b) = call("GET", "/api/v1/sources")
        if (c != 200) return fail(c, b)
        out(f"${"ID"}%-38s ${"NAME"}%-20s ${"HOST"}%-20s DATABASE")
        b \ "sources" match {
          case JArray(ss) => ss.foreach { s =>
            out(f"${str(s \ "id")}%-38s ${str(s \ "name")}%-20s " +
              f"${str(s \ "host")}%-20s ${str(s \ "database_name")}")
          }
          case _ => ()
        }
        0

      case "pipelines" :: rest => rest match {
        case Nil =>
          val (c, b) = call("GET", "/api/v1/pipelines")
          if (c != 200) return fail(c, b)
          out(f"${"ID"}%-38s ${"NAME"}%-20s ${"TABLES"}%-7s STATUS")
          b \ "pipelines" match {
            case JArray(ps) => ps.foreach { p =>
              val n = p \ "tables" match {
                case JArray(ts) => ts.size.toString
                case _          => "0"
              }
              out(f"${str(p \ "id")}%-38s ${str(p \ "name")}%-20s " +
                f"$n%-7s ${str(p \ "status")}")
            }
            case _ => ()
          }
          0
        case action :: id :: Nil if action == "start" || action == "stop" =>
          val (c, b) = call("POST", s"/api/v1/pipelines/$id/$action")
          if (c != 200) return fail(c, b)
          out(s"${str(b \ "id")}: ${str(b \ "status")}")
          0
        case _ =>
          out("Usage: graft pipelines [start|stop <id>]"); 1
      }

      case "sql" :: Nil =>
        out("Usage: graft sql \"<query>\" (quote the whole statement)"); 1

      case "sql" :: rest =>
        // an unquoted statement arrives shell-split — rejoin it
        val query = rest.mkString(" ")
        val (c, first) = call("POST", "/query/sql",
          Some(JsonMethods.compact(JsonMethods.render(
            JObject("sql" -> JString(query))))))
        if (c != 200) return fail(c, first)
        // total pattern matches throughout: a proxy answering 200 with
        // a non-JSON body must produce a clean error, never a CCE
        def pageRows(page: JValue): List[JValue] = page \ "rows" match {
          case JArray(rows) => rows
          case _            => Nil
        }
        def printPage(page: JValue): Unit = pageRows(page).foreach {
          case JArray(cells) => out(cells.map(str).mkString("\t"))
          case other         => out(str(other))
        }
        first \ "columns" match {
          case JArray(cols) => out(cols.map(str).mkString("\t"))
          case _ =>
            out(s"Error: response is not a query result page"); return 1
        }
        printPage(first)
        var next = first \ "next_uri"
        var total = pageRows(first).size
        while (next != JNothing && next != JNull) {
          val (pc, page) = call("GET", str(next))
          if (pc != 200) return fail(pc, page)
          printPage(page)
          total += pageRows(page).size
          next = page \ "next_uri"
        }
        out(s"($total rows)")
        0

      case other :: _ =>
        out(s"Unknown command: $other")
        out(usage)
        1
    }
  }

  def main(args: Array[String]): Unit = {
    // purely-local commands never require an API endpoint
    val needsApi = args.headOption match {
      case None => false
      case Some("keygen" | "version" | "-v" | "--version" |
                "help" | "-h" | "--help") => false
      case Some(_) => true
    }
    val base = sys.env.get("GRAFT_API_URL") match {
      case Some(u)             => u
      case None if !needsApi   => ""
      case None =>
        System.err.println("GRAFT_API_URL must point at a running graft API")
        sys.exit(1)
    }
    sys.exit(run(base, sys.env.get("GRAFT_TOKEN"), args.toSeq, println))
  }
}
