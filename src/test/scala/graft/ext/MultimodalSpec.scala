package graft.ext

import graft.GraftSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private lazy val assets = Seq("hello world", "hello world", "other bytes")
    .toDF("text").select(Multimodal.syntheticPayload($"text").as("payload"))

  test("payload is BinaryType; content hash collapses identical bytes") {
    assert(assets.schema("payload").dataType == BinaryType)
    val n = assets
      .agg(count_distinct(Multimodal.contentHash($"payload"))).collect()(0).getLong(0)
    assert(n == 2L)
  }

  test("frames: slices reassemble to the payload; count = ceil(bytes/size)") {
    val r = assets.limit(1)
      .select($"payload", Multimodal.frames($"payload", 4).as("fr"))
      .select(size($"fr").as("n"),
        (concat($"fr".getItem(0), $"fr".getItem(1), $"fr".getItem(2))
          === $"payload").as("same"))
      .collect()(0)
    assert(r.getInt(0) == 3) // 11 bytes / 4 → 3 frames
    assert(r.getBoolean(1))
  }

  test("BinaryDecoder seam: stub impl appends a dims-wide feature column") {
    val dec: BinaryDecoder = new StubDecoder(dims = 6) // through the trait
    val out = dec.decode(assets, "payload", "features")
    assert(out.columns.toSeq == Seq("payload", "features"))
    val feats = out.select($"features").as[Seq[Double]].collect()
    assert(feats.forall(_.length == dec.dims))
    // decoding must stay shuffle-free: per-row expression, single stage
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("decodeStub: deterministic fixed-width features in [0,1)") {
    val f1 = assets.select(Multimodal.decodeStub($"payload", 4).as("f"))
      .as[Seq[Double]].collect()
    val f2 = assets.select(Multimodal.decodeStub($"payload", 4).as("f"))
      .as[Seq[Double]].collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(v => v.length == 4 && v.forall(x => x >= 0.0 && x < 1.0)))
    assert(f1(0).toSeq == f1(1).toSeq) // same bytes → same features
    assert(f1(0).toSeq != f1(2).toSeq)
  }
}
