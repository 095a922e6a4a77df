package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SQL-callable MAINTENANCE surface (`CALL g.system.<proc>(...)`,
  * Spark 4's DSv2 procedure API — the same shape as Iceberg's
  * `system.rewrite_data_files`): table housekeeping a pure-SQL operator
  * runs with no JVM API in sight. Each procedure resolves its table
  * through the owning catalog's warehouse, drives the corresponding
  * [[Sources]] commit (pinned readers unharmed by construction — every
  * maintenance op is just another conflict-detected version), and
  * returns its outcome as a one-row LocalScan result set. */
private[sources] object GraftProcedures {

  /** One maintenance procedure: fixed IN parameters, one result row. */
  private final class Proc(
      procName: String,
      params: Seq[(String, DataType, Option[String])],
      resultSchema: StructType,
      body: (SparkSession, InternalRow) => Seq[Any])
    extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = s"graft maintenance: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false
    override def parameters(): Array[ProcedureParameter] =
      params.map { case (n, t, dflt) =>
        val b = ProcedureParameter.in(n, t)
        dflt.foreach(b.defaultValue)
        b.build()
      }.toArray

    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val out = body(SparkSession.active, input)
      val row = InternalRow.fromSeq(out.map {
        case s: String => UTF8String.fromString(s)
        case x => x
      })
      java.util.List.of[Scan](new org.apache.spark.sql.connector.read.LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = Array(row)
      }).iterator()
    }
  }

  /** Procedures of `catalog` — table args are catalog-relative names
    * (`'ns.t'` or `'t'`), resolved against the warehouse root. */
  def load(ident: Identifier, resolve: String => String): UnboundProcedure = {
    def table(input: InternalRow, i: Int): String =
      resolve(input.getUTF8String(i).toString)
    val proc: Option[Proc] =
      (ident.namespace().toSeq, ident.name().toLowerCase) match {
        case (Seq("system"), "optimize") => Some(new Proc(
          "optimize",
          Seq(("table", StringType, None),
            ("target_records", LongType, Some("1000000")),
            // optional scope: only files whose path contains this
            // substring (a hive partition dir like 'month=2024-02')
            // rewrite — OPTIMIZE ... WHERE for the hot partition
            ("scope", StringType, Some("''")),
            // optional small-file targeting: only files UNDER this many
            // bytes rewrite (0 = off) — repairs micro-batch
            // fragmentation without touching the already-right-sized
            // bulk; composes with scope (AND)
            ("small_files_under", LongType, Some("0"))),
          StructType(Seq(StructField("version", IntegerType),
            StructField("files_before", IntegerType),
            StructField("files_after", IntegerType))),
          (spark, in) => {
            val scope = in.getUTF8String(2).toString
            val maxBytes = in.getLong(3)
            val (v, before, after) =
              if (scope.isEmpty && maxBytes <= 0)
                Sources.compactVersion(spark, table(in, 0), in.getLong(1))
              else Sources.compactVersionWhere(spark, table(in, 0),
                in.getLong(1), f =>
                  (scope.isEmpty || f.contains(scope)) &&
                    (maxBytes <= 0 || scala.util.Try(
                      java.nio.file.Files.size(
                        java.nio.file.Paths.get(f))).getOrElse(Long.MaxValue)
                      < maxBytes))
            Seq(v, before, after)
          }))
        case (Seq("system"), "vacuum") => Some(new Proc(
          "vacuum",
          Seq(("table", StringType, None),
            ("keep_last", IntegerType, Some("2"))),
          StructType(Seq(StructField("manifests_removed", IntegerType),
            StructField("data_files_deleted", IntegerType))),
          (_, in) => {
            val (m, f) = Sources.vacuumVersions(table(in, 0), in.getInt(1))
            Seq(m, f)
          }))
        case (Seq("system"), "enable_rowids") => Some(new Proc(
          "enable_rowids",
          // opt a FLAT table into row lineage: derives + persists the
          // id assignment for every live version now, then every
          // commit maintains it ([[graft.sources.RowIds]]); the
          // `_row_id` metadata column and `` t$rid `` appear
          Seq(("table", StringType, None)),
          StructType(Seq(StructField("version", IntegerType),
            StructField("next_row_id", LongType))),
          (_, in) => {
            val t = table(in, 0)
            RowIds.enableRowIds(t)
            val v = Sources.latestVersion(t)
            // Seq[Any]: Seq(Int, Long) would numerically WIDEN the
            // version to Long and break the IntegerType slot
            Seq[Any](v, RowIds.ridOf(t, v)._2)
          }))
        case (Seq("system"), "purge_dv") => Some(new Proc(
          "purge_dv",
          Seq(("table", StringType, None)),
          StructType(Seq(StructField("version", IntegerType),
            StructField("files_purged", IntegerType))),
          (spark, in) => {
            val (v, purged) = Sources.purgeDv(spark, table(in, 0))
            Seq(v, purged)
          }))
        case (Seq("system"), "purge_eq") => Some(new Proc(
          "purge_eq",
          Seq(("table", StringType, None)),
          StructType(Seq(StructField("version", IntegerType),
            StructField("files_rewritten", IntegerType))),
          (spark, in) => {
            val (v, rewritten) = Sources.purgeEq(spark, table(in, 0))
            Seq(v, rewritten)
          }))
        case (Seq("system"), "analyze") => Some(new Proc(
          "analyze",
          Seq(("table", StringType, None),
            ("columns", StringType, None)),
          StructType(Seq(StructField("version", IntegerType),
            StructField("n_columns", IntegerType))),
          (spark, in) => {
            val t = table(in, 0)
            val cols = in.getUTF8String(1).toString.split(",")
              .map(_.trim).filter(_.nonEmpty).toSeq
            val v = Sources.latestVersion(t)
            Sources.commitStats(spark, t, v, cols)
            Seq(v, cols.length)
          }))
        case (Seq("system"), "expire") => Some(new Proc(
          "expire",
          // per-ref retention: bound a BRANCH's history to keep_last
          // versions (branch-local files only — carried parent files
          // are the parent vacuum's to judge); tags are one version by
          // construction — drop_tag releases them
          Seq(("table", StringType, None), ("ref", StringType, None),
            ("keep_last", IntegerType, Some("1"))),
          StructType(Seq(StructField("manifests_removed", IntegerType),
            StructField("local_files_deleted", IntegerType))),
          (_, in) => {
            val t = table(in, 0)
            val ref = in.getUTF8String(1).toString
            if (Refs.tagsOf(t).contains(ref))
              throw new IllegalArgumentException(
                s"'$ref' is a tag — a tag pins exactly one version; " +
                  "CALL system.drop_tag to release it")
            val (m, f) = Refs.expireBranch(t, ref, in.getInt(2))
            Seq(m, f)
          }))
        case (Seq("system"), "set_partitioning") => Some(new Proc(
          "set_partitioning",
          // transform as 'kind(column)' — e.g. 'hours(ets)'; temporal
          // kinds only, same source column (see Sources.setPartTransform)
          Seq(("table", StringType, None),
            ("transform", StringType, None)),
          StructType(Seq(StructField("kind", StringType),
            StructField("column", StringType))),
          (_, in) => {
            val spec = in.getUTF8String(1).toString.trim
            val m = "([A-Za-z]+)\\s*\\(\\s*([A-Za-z0-9_]+)\\s*\\)".r
            spec match {
              case m(kind, column) =>
                Sources.setPartTransform(table(in, 0),
                  Sources.PartTransform(kind.toLowerCase, column, 0))
                Seq(kind.toLowerCase, column)
              case _ => throw new IllegalArgumentException(
                s"set_partitioning: expected 'kind(column)', got '$spec'")
            }
          }))
        case (Seq("system"), "rollback") => Some(new Proc(
          "rollback",
          Seq(("table", StringType, None),
            ("version", IntegerType, None)),
          StructType(Seq(StructField("restored_as_version", IntegerType))),
          (_, in) => Seq(Sources.rollbackTo(table(in, 0), in.getInt(1)))))
        case (Seq("system"), "tag") => Some(new Proc(
          "tag",
          Seq(("table", StringType, None), ("name", StringType, None),
            ("version", IntegerType, Some("-1"))),
          StructType(Seq(StructField("tagged_version", IntegerType))),
          (_, in) => Seq(Refs.tagVersion(table(in, 0),
            in.getUTF8String(1).toString, in.getInt(2)))))
        case (Seq("system"), "drop_tag") => Some(new Proc(
          "drop_tag",
          Seq(("table", StringType, None), ("name", StringType, None)),
          StructType(Seq(StructField("dropped", BooleanType))),
          (_, in) => Seq(Refs.dropTag(table(in, 0),
            in.getUTF8String(1).toString))))
        case (Seq("system"), "create_branch") => Some(new Proc(
          "create_branch",
          Seq(("table", StringType, None), ("name", StringType, None)),
          StructType(Seq(StructField("branch_dir", StringType))),
          (_, in) => Seq(Refs.createBranch(table(in, 0),
            in.getUTF8String(1).toString))))
        case (Seq("system"), "publish_branch") => Some(new Proc(
          "publish_branch",
          Seq(("table", StringType, None), ("name", StringType, None)),
          StructType(Seq(StructField("published_as_version", IntegerType))),
          (_, in) => Seq(Refs.publishBranch(table(in, 0),
            in.getUTF8String(1).toString))))
        case (Seq("system"), "drop_branch") => Some(new Proc(
          "drop_branch",
          Seq(("table", StringType, None), ("name", StringType, None)),
          StructType(Seq(StructField("dropped", BooleanType))),
          (_, in) => {
            Refs.dropBranch(table(in, 0), in.getUTF8String(1).toString)
            Seq(true)
          }))
        case _ => None
      }
    proc.getOrElse(throw new RuntimeException(
      s"graft has no procedure ${ident.namespace().mkString(".")}." +
        ident.name() + " — see system.{optimize,vacuum,purge_dv," +
        "purge_eq,analyze,set_partitioning,expire,rollback,tag,drop_tag," +
        "create_branch," +
        "publish_branch,drop_branch}"))
  }

  val all: Array[Identifier] =
    Array("optimize", "vacuum", "purge_dv", "purge_eq", "analyze",
        "set_partitioning", "expire", "rollback", "tag", "drop_tag",
        "create_branch", "publish_branch", "drop_branch")
      .map(Identifier.of(Array("system"), _))
}
