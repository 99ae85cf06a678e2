package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r5 table-format switch at the DDL level — this runtime has
  * no iceberg jars, so the iceberg arm is verified as the exact DDL a
  * cluster WITH them would execute (the drop-in mapping documented in
  * [[Checkpoint]]'s scaladoc). The parquet arm must stay byte-stable:
  * it is the DDL the whole bucketed-join plan evidence (BENCH/PLANS.md
  * §7) was measured under. */
class CheckpointSpec extends AnyFunSuite {

  private val cols = "url_hash BIGINT, url_canon STRING"

  test("parquet DDL: wave-partitioned, bucketed+sorted on (url_hash, url_canon)") {
    val ddl = Checkpoint.bucketedDdl("graft_seen_ab", cols, 32, "/tmp/ck/seen", "parquet")
    assert(ddl.contains("USING parquet PARTITIONED BY (wave)"))
    assert(ddl.contains("CLUSTERED BY (url_hash, url_canon) SORTED BY (url_hash, url_canon)"))
    assert(ddl.contains("INTO 32 BUCKETS"))
    assert(ddl.contains("LOCATION '/tmp/ck/seen'"))
  }

  test("iceberg DDL: wave + bucket(n, url_hash) partition transforms, same location") {
    val ddl = Checkpoint.bucketedDdl("graft_seen_ab", cols, 32, "/tmp/ck/seen", "iceberg")
    assert(ddl.contains("USING iceberg PARTITIONED BY (wave, bucket(32, url_hash))"))
    assert(ddl.contains("LOCATION '/tmp/ck/seen'"))
    assert(!ddl.contains("RECOVER"), "iceberg tables must not see Hive partition recovery")
  }

  test("unknown format refused") {
    intercept[IllegalArgumentException] {
      Checkpoint.bucketedDdl("t", cols, 8, "/tmp/x", "delta")
    }
  }
}
