package graft

import org.apache.spark.sql.SparkSession

import graft.api.{ApiServer, ControlPlane}
import graft.lake.{GraftCatalog, RestCatalogServer}
import graft.streaming.PgPipelineRunner

/** The engine's deployable entry point — the Spark-side counterpart of
  * the reference's service binaries (ref cmd/philotes-api/main.go: the
  * management + query API; cmd/philotes-worker/main.go: the CDC worker
  * wired source → pipeline → Iceberg catalog):
  *
  *   - ONE SparkSession (the worker and the query layer share the
  *     engine — where the reference runs Trino beside its worker,
  *     Spark is both);
  *   - the SQL catalog registered over the warehouse;
  *   - [[ControlPlane]] + [[PgPipelineRunner]]: pipeline CRUD whose
  *     `start` actuates a REAL WAL-tailing drain into the lake;
  *   - [[ApiServer]]: the `/query` group, `/api/v1` control plane,
  *     `/metrics` exposition;
  *   - [[RestCatalogServer]]: the Iceberg REST catalog protocol over
  *     the same warehouse, so external engines and the reference's own
  *     client can load tables and commit appends.
  *
  * Configuration is environment-first like the reference's
  * `config.Load` (ref internal/config): `GRAFT_WAREHOUSE` (or arg 1,
  * required), `GRAFT_API_PORT` / `GRAFT_REST_PORT` (default ephemeral),
  * `GRAFT_TOKEN` (bearer auth on both servers when set),
  * `GRAFT_PREFIX` (REST warehouse prefix, default `graft`),
  * `GRAFT_MASTER` (default `local[*]` — on a cluster, submit with the
  * real master and this is ignored by spark-submit's precedence).
  * Both servers bind loopback; production fronting (TLS, external
  * exposure) belongs to a proxy, the same posture as the reference's
  * deployment charts.
  *
  * Prints ONE JSON line with the bound endpoints, then serves until
  * SIGTERM/SIGINT (a shutdown hook closes servers, stops pipelines
  * through the control plane's runner, and stops Spark). */
object Serve {

  /** Everything [[main]] starts, closable for tests. */
  final class Handle(val spark: SparkSession, val api: ApiServer,
                     val rest: RestCatalogServer,
                     val controlPlane: ControlPlane) extends AutoCloseable {
    override def close(): Unit = {
      // stop running pipelines first: their drain loops hold PG sockets
      // and write to the lake — the servers go down after the writers
      controlPlane.listPipelines().filter(_.status == "running").foreach {
        p => try controlPlane.stopPipeline(p.id) catch { case _: Throwable => () }
      }
      api.close()
      rest.close()
    }
  }

  /** Wire the service over an EXISTING session (tests pass theirs). */
  def start(spark: SparkSession, warehouse: String,
            token: Option[String] = None, prefix: String = "graft",
            apiPort: Int = 0, restPort: Int = 0,
            catalogName: String = "graft"): Handle = {
    spark.conf.set(s"spark.sql.catalog.$catalogName", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catalogName.warehouse", warehouse)
    // control-plane state lives BESIDE the warehouse, not inside it —
    // a foreign directory under the warehouse root would surface as a
    // phantom namespace in SHOW NAMESPACES and the REST listing
    val runner = new PgPipelineRunner(spark, warehouse)
    val cp = new ControlPlane(s"${warehouse.stripSuffix("/")}_control", runner)
    val api = new ApiServer(spark, authToken = token,
      controlPlane = Some(cp), bindPort = apiPort)
    val rest = new RestCatalogServer(spark, warehouse, prefix = prefix,
      authToken = token, bindPort = restPort)
    new Handle(spark, api, rest, cp)
  }

  def main(args: Array[String]): Unit = {
    val env = sys.env
    val warehouse = env.get("GRAFT_WAREHOUSE").orElse(args.headOption)
      .getOrElse(throw new IllegalArgumentException(
        "GRAFT_WAREHOUSE (or the first argument) must name the warehouse directory"))
    def port(key: String): Int = env.get(key).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master(env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions",
        env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.extensions", "graft.lake.GraftSqlExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val handle = start(spark, warehouse,
      token = env.get("GRAFT_TOKEN"),
      prefix = env.getOrElse("GRAFT_PREFIX", "graft"),
      apiPort = port("GRAFT_API_PORT"), restPort = port("GRAFT_REST_PORT"))
    val done = new java.util.concurrent.CountDownLatch(1)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      handle.close()
      spark.stop()
      done.countDown()
    }))
    println(s"""{"api":"${handle.api.baseUri}","catalog":"${handle.rest.baseUri}/catalog/v1","warehouse":"$warehouse"}""")
    done.await()
  }
}
