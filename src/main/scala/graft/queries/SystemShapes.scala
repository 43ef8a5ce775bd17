package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.io.VdvX10
import graft.llm.Multimodal
import graft.ops.{Cleaning, Geo}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** System-level capabilities that don't map to the star-schema tables:
  * the VDV .x10 custom source, point-in-polygon region assignment,
  * multimodal decode plumbing, and the streaming-equivalent windowed
  * aggregation (the last one oracle-checked on `events`).
  */
object SystemShapes {

  /** Materialize an embedded fixture to tmp, REWRITING when the
    * embedded content changed — an exists()-only guard would keep
    * parsing a stale file from a previous build after the fixture is
    * edited in code, with tests silently running against old bytes.
    * The rewrite goes through a temp file + atomic rename so a
    * concurrent reader in another JVM sharing the tmpdir never sees a
    * truncated fixture. */
  private def materialize(p: java.nio.file.Path, content: String): String = {
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if (!Files.exists(p) || !java.util.Arrays.equals(Files.readAllBytes(p), bytes)) {
      val tmp = Files.createTempFile(p.getParent, p.getFileName.toString, ".tmp")
      Files.write(tmp, bytes)
      Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    p.toString
  }

  /** Deterministic embedded VDV fixture (LINE + OPERATING_DEPARTMENT,
    * generic atr;/frm; variant), materialized to tmp on first use. */
  private[graft] lazy val vdvFixturePath: String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_vdv_fixture.x10")
    val content =
      """mod; DD.MM.YYYY; HH:MM:SS; free
        |tbl; LINE
        |atr; BASE_VERSION; LINE_NO; LINE_ABBR; OP_DEP_NO; LINE_DESC
        |frm; num[9.0]; num[9.0]; char[6]; num[9.0]; char[40]
        |rec; 1; 101; "A1"; 11; "Airport Express"
        |rec; 1; 102; "B-2"; 12; "Corniche Loop"
        |rec; 1; 103; "C3"; 21; "Al Ain Shuttle"
        |rec; 1; 104; "D4"; 31; "Dhafra Link"
        |rec; 1; 104; "D4"; 31; "Dhafra Link duplicate"
        |rec; 1; 105; "E5"; 99; "Orphan Route"
        |end;
        |tbl; OPERATING_DEPARTMENT
        |atr; BASE_VERSION; OP_DEP_NO; OP_DEP_ABBR; OP_DEP_DESC
        |frm; num[9.0]; num[9.0]; char[6]; char[40]
        |rec; 1; 11; "AD1"; "Abu Dhabi Central"
        |rec; 1; 12; "AD2"; "Abu Dhabi West"
        |rec; 1; 21; "ER1"; "Al Ain Main"
        |rec; 1; 31; "WR1"; "Al Dhafra Main"
        |end;
        |""".stripMargin
    materialize(p, content)
  }

  /** S9-S11 — the VdvX10 multi-table source + the reference's
    * LINE×OPERATING_DEPARTMENT region flow (J1+J2+F1+F2): dedup the dim,
    * deep_clean the join key, broadcast join, prefix-dispatch regions.
    * Rows-only (fixture lives outside sfDir so DuckDB can't see it);
    * VdvX10Spec asserts exact parsed contents. */
  val q34 = QueryDef(
    "q34_vdv_x10_source",
    (s, dir) => {
      val line = VdvX10.readTable(s, vdvFixturePath, "LINE")
        .dropDuplicates("LINE_ABBR")
      val opDep = VdvX10.readTable(s, vdvFixturePath, "OPERATING_DEPARTMENT")
      val joined = line
        .withColumn("line_clean", Cleaning.deepClean(col("LINE_ABBR")))
        .join(broadcast(opDep), Seq("OP_DEP_NO"), "left")
        .withColumn("region_id", Cleaning.regionFromPrefix(col("OP_DEP_ABBR")))
      joined.groupBy(col("region_id"))
        .agg(count(lit(1)).as("n_lines"),
             concat_ws(",", sort_array(collect_list(col("line_clean")))).as("lines"))
        .orderBy(col("region_id"))
    },
    None, bench = false)

  /** S13 — deterministic GeoJSON FeatureCollection fixture (the three
    * region polygons as Polygon features), materialized to tmp on
    * first use; read by [[graft.io.GeoJson]] in q35. */
  private[graft] lazy val geoJsonFixturePath: String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_regions.geojson")
    def feature(rid: String, ring: String) =
      s"""{"type": "Feature", "properties": {"region_id": "$rid"},
         | "geometry": {"type": "Polygon", "coordinates": [[$ring]]}}""".stripMargin
    val content =
      s"""{"type": "FeatureCollection", "features": [
         |${feature("AbuDhabi", "[54.0, 24.0], [54.5, 24.0], [54.5, 24.6], [54.0, 24.6], [54.0, 24.0]")},
         |${feature("AlAin", "[55.5, 24.0], [56.0, 24.0], [56.0, 24.5], [55.5, 24.5], [55.5, 24.0]")},
         |${feature("AlDhafra", "[52.5, 23.0], [54.0, 23.0], [54.0, 24.0], [52.5, 24.0], [52.5, 23.0]")}
         |]}""".stripMargin
    materialize(p, content)
  }

  /** S12 — the Excel service-type dim, PRECONVERTED to CSV (the survey
    * disposition: no Excel reader in Spark core; a real deployment runs
    * `scripts/convert_excel_dims.py` once over
    * `scripts/dim_region_manual.xlsx` etc. — this fixture is the
    * converted shape, including the ADL row q-fixups target). */
  private[graft] lazy val serviceDimCsvPath: String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_service_dim.csv")
    val content =
      """Route,Region,Type
        |A1,Abu Dhabi,Link
        |B2,Abu Dhabi,Regional
        |C3,Al Ain,Local
        |D4,Al Dhafra,Link
        |ADL,NA,Express
        |""".stripMargin
    materialize(p, content)
  }

  /** J12+F23+F24+S13 — point-in-polygon region assignment over
    * synthetic stop coordinates: region polygons loaded from the
    * GeoJSON fixture (S13 scan path), points derived deterministically
    * from customer keys. Rows-only; GeoSpec holds the exact
    * containment oracle. */
  val q35 = QueryDef(
    "q35_geo_region_assign",
    (s, dir) => {
      val polys = graft.io.GeoJson.polygonDim(s, geoJsonFixturePath, "region_id")
      val pts = Tables.customer(s, dir).select(
        col("c_custkey"),
        (lit(52.6) + (col("c_custkey") % 35) * 0.1).as("lon"),
        (lit(23.1) + (col("c_custkey") % 15) * 0.1).as("lat"))
      Geo.assignRegion(pts, "lon", "lat", polys)
        .groupBy(col("region_id"))
        .agg(count(lit(1)).as("n_stops"),
             round(avg(col("lon")), 4).as("mean_lon"),
             round(avg(col("lat")), 4).as("mean_lat"))
        .orderBy(col("region_id"))
    },
    None, bench = false)

  /** Multimodal plumbing — binary payload columns, batched decode via
    * mapPartitions (stubbed codecs, real schema/partitioning/batch
    * shape), per-kind feature rollup + video frame sampling. */
  val q36 = QueryDef(
    "q36_multimodal_features",
    (s, dir) => {
      val media = Multimodal.asMediaTable(
        Tables.documents(s, dir), "doc_id", "text",
        kindCol = element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")),
        sourceCol = "source")
      val feats = Multimodal.decodeAndExtract(media)
      val frames = Multimodal.sampleFrames(feats, stride = 4)
        .groupBy(col("media_id")).agg(count(lit(1)).as("n_sampled"))
      feats.toDF.join(frames, Seq("media_id"), "left")
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_media"),
             sum(col("byte_len")).as("total_bytes"),
             avg(col("width")).as("avg_width"),
             sum(coalesce(col("n_sampled"), lit(0L))).as("frames_sampled"))
        .orderBy(col("kind"))
    },
    None, bench = false)

  /** ST batch-equivalent of EventStream.tumblingCounts: hourly tumbling
    * event-time windows (same plan Structured Streaming runs
    * incrementally; StreamingSpec asserts stream==batch). Oracle via
    * date_trunc. */
  val q37 = QueryDef(
    "q37_tumbling_window_agg",
    (s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        // exact cents sum (Cleaning.sumExact2) — same expression the
        // streaming twin aggregates, so stream==batch is exact and the
        // cross-engine round-half tie class is closed
        .agg(count(lit(1)).as("n_events"),
             graft.ops.Cleaning.sumExact2(col("value")).as("total_value"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS window_start,
           |  event_type,
           |  CAST(count(*) AS BIGINT) AS n_events,
           |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0
           |    AS total_value
           |FROM events
           |GROUP BY 1, 2
           |ORDER BY 1, 2""".stripMargin))

  /** The explicit skew toolkit under a full oracle: a salted
    * replicated-dim inner join (the AQE-uncoverable case — downstream
    * co-partitioned consumers) feeding a per-type rollup, merged with a
    * two-phase salted distinct count. Both rewrites are algebraic, so
    * the DuckDB twin is the PLAIN join + COUNT DISTINCT — the oracle
    * proves the salted forms equal the unsalted semantics on real data,
    * complementing OpsSpec's property-level equality. */
  val q53 = QueryDef(
    "q53_skew_tools",
    (s, dir) => {
      import graft.ops.Skew
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("user_id"))
      val typeDim = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_type"))
      val joined = Skew.saltedInnerJoin(ev, typeDim, Seq("event_type"),
        saltFrom = col("event_id"), buckets = 8)
      val counts = joined.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), min(col("n_type")).as("n_type"))
      val dc = Skew.distinctCountSalted(ev, Seq("event_type"), "user_id", "n_users")
      counts.join(dc, Seq("event_type"))
        .select(col("event_type"), col("n_rows"), col("n_type"), col("n_users"))
        .orderBy(col("event_type"))
    },
    Some("""WITH td AS (
           |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
           |  FROM events GROUP BY 1),
           |dc AS (
           |  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
           |  FROM events GROUP BY 1)
           |SELECT e.event_type,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  MIN(t.n_type) AS n_type,
           |  MIN(d.n_users) AS n_users
           |FROM events e
           |JOIN td t ON e.event_type = t.event_type
           |JOIN dc d ON e.event_type = d.event_type
           |GROUP BY e.event_type
           |ORDER BY e.event_type""".stripMargin))

  val all: Seq[QueryDef] = Seq(q34, q35, q36, q37, q53)
}
