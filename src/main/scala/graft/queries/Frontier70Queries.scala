package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Seventieth frontier batch: tamper-evident version chain. (The
  * batch's streaming member, ev81s CEP, registers in StreamingQueries.)
  */
object Frontier70Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- C46: tamper-evident dataset version chain --------------------------
    // c40 fingerprints one snapshot; a release PIPELINE needs the
    // chain: each day's content digest links into c_k = (c_{k-1}·31 +
    // d_k) mod p, so replacing ANY historical day invalidates every
    // later chain value — the audit property git gives commits,
    // rebuilt relationally. Day digests are order-independent md5
    // sums (c40); the chain itself is a bounded fold over the sorted
    // 30-day list. Verifiers recompute any suffix from one trusted
    // prefix value.
    QueryDef.sql(
      "c46_version_chain",
      """WITH dd AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(CAST(sum(CAST(('0x' || substr(md5(
        |        CAST(event_id AS VARCHAR) || ':' || event_type || ':' ||
        |        CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR)), 1, 15))::BIGINT
        |      AS HUGEINT)) AS HUGEINT) % 1000000007 AS BIGINT) AS digest
        |  FROM events GROUP BY 1),
        |arr AS (
        |  SELECT list(day ORDER BY day) AS days,
        |    list(digest ORDER BY day) AS ds, CAST(count(*) AS INT) AS t
        |  FROM dd),
        |chain AS (
        |  SELECT unnest(list_transform(range(1, t + 1), i -> {
        |      'day': days[i], 'digest': ds[i],
        |      'chain': list_reduce(list_prepend(CAST(0 AS BIGINT), ds[1:i]),
        |        (acc, x) -> (acc * 31 + x) % 1000000007)
        |    })) AS u
        |  FROM arr)
        |SELECT u.day AS day, u.digest AS digest, u.chain AS chain_value
        |FROM chain ORDER BY day""".stripMargin) { (s, d) =>
      val dd = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"),
          conv(substring(md5(concat(
            col("event_id").cast("string"), lit(":"), col("event_type"), lit(":"),
            floor(col("value") * 100).cast("long").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("hv"))
        .groupBy(col("day"))
        .agg(pmod(sum(col("hv").cast(org.apache.spark.sql.types.DecimalType(38, 0))),
          lit(1000000007L).cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long").as("digest"))
      val arr = dd.agg(
        transform(array_sort(collect_list(struct(col("day"), col("digest")))),
          e => e.getField("day")).as("days"),
        transform(array_sort(collect_list(struct(col("day"), col("digest")))),
          e => e.getField("digest")).as("ds"),
        count(lit(1)).cast("int").as("t"))
      arr.select(explode(expr(
          """transform(sequence(1, t), i -> struct(
            |  element_at(days, i) as day, element_at(ds, i) as digest,
            |  aggregate(slice(ds, 1, i), cast(0 as bigint),
            |    (acc, x) -> (acc * 31 + x) % 1000000007L) as chain))""".stripMargin))
          .as("u"))
        .select(col("u.day").as("day"), col("u.digest").as("digest"),
          col("u.chain").as("chain_value"))
        .orderBy(col("day"))
    }
  )
}
