package graft.execute

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.core.{ConfigValue, Params, PipelineContext, Stage}

/** LogExecute — SQL → one message value written to the structured log
  * (SURVEY.md §2.2; reference Common.scala:367-380).
  */
final case class LogExecute(
    name: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty,
    logger: String => Unit = m => {
      org.slf4j.LoggerFactory.getLogger("graft").info(m)
      graft.core.LogBuffer.append(m) // cell-visible (reference showLog)
    }
) extends Stage {
  val stageType = "LogExecute"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val df = ctx.spark.sql(Params.injectParameters(sql, ctx.sqlParams ++ sqlParams))
    val row = df.limit(1).collect().headOption
    row.foreach(r => logger(String.valueOf(r.get(0))))
    None
  }
}

/** ConfigExecute — SQL → one JSON object whose entries become session params
  * (SURVEY.md §2.2; reference Common.scala:381-393).
  */
final case class ConfigExecute(
    name: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty
) extends Stage {
  val stageType = "ConfigExecute"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val df = ctx.spark.sql(Params.injectParameters(sql, ctx.sqlParams ++ sqlParams))
    val row = df.limit(1).collect().headOption
    row.foreach { r =>
      val json = String.valueOf(r.get(0))
      JsonMethods.parse(json) match {
        case JObject(kvs) =>
          kvs.foreach {
            case (k, JString(v)) => ctx.params(k) = ConfigValue(v)
            case (k, other) =>
              ctx.params(k) = ConfigValue(JsonMethods.compact(JsonMethods.render(other)))
          }
        case _ =>
          throw new IllegalArgumentException(s"ConfigExecute $name: result is not a JSON object: $json")
      }
    }
    None
  }
}

/** PipelineExecute — inline a child pipeline (SURVEY.md §2.2). */
final case class PipelineExecute(
    name: String,
    stages: Seq[Stage]
) extends Stage {
  val stageType = "PipelineExecute"
  def execute(ctx: PipelineContext): Option[DataFrame] =
    graft.core.Runner.run(stages, ctx)
}

/** JDBCExecute — run DDL/DML on an external database over plain JDBC.
  * No database is reachable in this environment — compiles, untested here.
  */
final case class JDBCExecute(
    name: String,
    jdbcURL: String,
    sql: String,
    connectionProperties: Map[String, String] = Map.empty
) extends Stage {
  val stageType = "JDBCExecute"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val props = new java.util.Properties()
    connectionProperties.foreach { case (k, v) => props.setProperty(k, v) }
    val conn = java.sql.DriverManager.getConnection(jdbcURL, props)
    try {
      val stmt = conn.createStatement()
      try stmt.execute(sql)
      finally stmt.close()
    } finally conn.close()
    None
  }
}

/** HTTPExecute — POST a payload to an endpoint at pipeline position, failing
  * the pipeline on an unexpected status (reference HTTPExecute: key/value
  * payload + validStatusCodes). Default transport is a REAL HTTP POST
  * (graft.core.Http, JDK client).
  */
final case class HTTPExecute(
    name: String,
    uri: String,
    payload: String = "",
    headers: Map[String, String] = Map.empty,
    validStatusCodes: Seq[Int] = Seq(200, 201, 202),
    transport: (String, Map[String, String], String) => (Int, String) =
      (u, h, b) => graft.core.Http.postString(u, b, h)
) extends Stage {
  val stageType = "HTTPExecute"
  def execute(ctx: PipelineContext): Option[DataFrame] = {
    val body = Params.injectParameters(payload, ctx.sqlParams)
    val (status, response) = transport(uri, headers, body)
    if (!validStatusCodes.contains(status))
      throw new graft.core.ValidationException(
        s"HTTPExecute $name: $uri returned $status (expected one of ${validStatusCodes.mkString(",")}): $response")
    graft.core.LogBuffer.append(s"HTTPExecute $name: $uri -> $status")
    None
  }
}
