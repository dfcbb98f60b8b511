package graft.multimodal

import graft.SparkSpec

class MediaSpec extends SparkSpec {

  private def mk(id: Long, s: String) = MediaRecord(id, "image", s.getBytes("UTF-8"))

  test("decodeMeta: checksum is md5 of payload, dims from md5 prefix") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(mk(1L, "hello world")))
    val m = Media.decodeMeta(ds, FakeDecoder).collect().head
    val h = FakeDecoder.md5Hex("hello world".getBytes("UTF-8"))
    assert(m.checksum == h)
    assert(m.n_bytes == 11L)
    assert(m.width == Integer.parseInt(h.substring(0, 2), 16))
    assert(m.height == Integer.parseInt(h.substring(2, 4), 16))
  }

  test("sampleFrames fans out 1-4 deterministic frames per record") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(mk(1L, "aaa"), mk(2L, "bbb")))
    val frames = Media.sampleFrames(ds, FakeDecoder).collect()
    val byId = frames.groupBy(_.id)
    assert(byId.values.forall(f => f.length >= 1 && f.length <= 4))
    // frame indices are 0..n-1 and checksums reproducible
    byId.foreach { case (_, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
    val again = Media.sampleFrames(ds, FakeDecoder).collect()
    assert(frames.map(_.frame_checksum).sorted.toSeq == again.map(_.frame_checksum).sorted.toSeq)
  }

  test("features are in [-1, 1) and exactly representable multiples of 1/128") {
    val f = FakeDecoder.features("payload bytes".getBytes("UTF-8"), 8)
    assert(f.length == 8)
    assert(f.forall(v => v >= -1.0 && v < 1.0))
    assert(f.forall(v => (v * 128).isWhole))
  }
}
