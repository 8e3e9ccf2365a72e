package graft

import graft.sources.{H5ad, MiniHdf5, MiniHdf5Writer}
import graft.sources.H5ad.H5adInput

/** End-to-end h5ad ingestion: miniature CSR h5ad files written per the
  * public HDF5 spec (MiniHdf5Writer) → [[MiniHdf5]] reader →
  * [[H5ad.scan]] long form → `ProductBuild.build` — closing the loop the
  * reference's users start from (`bin/concatenate.py:62` reads a
  * cell_by_bin/cell_by_gene h5ad pair per dataset).
  */
class H5adSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir = java.nio.file.Files.createTempDirectory("h5ad").toString

  // dataset uuid-A: 3 cells × 2 bins; c2 has no gene-modality rows
  private lazy val files: Seq[H5adInput] = {
    MiniHdf5Writer.writeH5ad(s"$dir/A_bin.h5ad",
      obsNames = Seq("c1", "c2", "c3"), varNames = Seq("bin1", "bin2"),
      data = Array(1.0, 2.0, 3.0, 4.0), indices = Array(0L, 1L, 0L, 1L),
      indptr = Array(0L, 2L, 3L, 4L), wide = true)
    // narrow types (f32 data, i32 indices) exercise both reader widths
    MiniHdf5Writer.writeH5ad(s"$dir/A_gene.h5ad",
      obsNames = Seq("c1", "c3"), varNames = Seq("g1", "g2", "g3"),
      data = Array(5.0, 6.0, 7.0), indices = Array(1L, 0L, 2L),
      indptr = Array(0L, 1L, 3L), wide = false)
    MiniHdf5Writer.writeH5ad(s"$dir/B_bin.h5ad",
      obsNames = Seq("c1"), varNames = Seq("bin1"),
      data = Array(9.0), indices = Array(0L), indptr = Array(0L, 1L))
    MiniHdf5Writer.writeH5ad(s"$dir/B_gene.h5ad",
      obsNames = Seq("c1"), varNames = Seq("g1"),
      data = Array(8.0), indices = Array(0L), indptr = Array(0L, 1L))
    Seq(
      H5adInput(s"$dir/A_bin.h5ad", "uuid-A", "cell_by_bin"),
      H5adInput(s"$dir/A_gene.h5ad", "uuid-A", "cell_by_gene"),
      H5adInput(s"$dir/B_bin.h5ad", "uuid-B", "cell_by_bin"),
      H5adInput(s"$dir/B_gene.h5ad", "uuid-B", "cell_by_gene"))
  }

  test("MiniHdf5 reads back groups, numeric widths and vlen strings") {
    files // force fixture write
    val r = new MiniHdf5.Reader(s"$dir/A_bin.h5ad")
    try {
      assert(r.ls("").sorted === Seq("X", "obs", "var"))
      assert(r.ls("X").sorted === Seq("data", "indices", "indptr"))
      assert(r.readStrings("obs/_index").toSeq === Seq("c1", "c2", "c3"))
      assert(r.readStrings("var/_index").toSeq === Seq("bin1", "bin2"))
      assert(r.readDoubles("X/data").toSeq === Seq(1.0, 2.0, 3.0, 4.0))
      assert(r.readLongs("X/indices").toSeq === Seq(0L, 1L, 0L, 1L))
      assert(r.readLongs("X/indptr").toSeq === Seq(0L, 2L, 3L, 4L))
    } finally r.close()
    // narrow file: f32/i32 datasets surface as the same doubles/longs
    val n = new MiniHdf5.Reader(s"$dir/A_gene.h5ad")
    try {
      assert(n.readDoubles("X/data").toSeq === Seq(5.0, 6.0, 7.0))
      assert(n.readLongs("X/indices").toSeq === Seq(1L, 0L, 2L))
    } finally n.close()
  }

  test("readTriplets expands CSR to long form with AnnData sparse semantics") {
    val t = H5ad.readTriplets(files.head).toSeq
    assert(t.map(x => (x.cell_id, x.feature_id, x.value)) === Seq(
      ("c1", "bin1", 1.0), ("c1", "bin2", 2.0),
      ("c2", "bin1", 3.0), ("c3", "bin2", 4.0)))
    assert(t.forall(x => x.dataset == "uuid-A" && x.modality == "cell_by_bin"))
  }

  test("distributed scan + ProductBuild: h5ad pair to data product, end to end") {
    val tmp = java.nio.file.Files.createTempDirectory("h5ad-prod").toString
    val modalities = H5ad.scanModalities(spark, files)
    assert(modalities.keySet === Set("cell_by_bin", "cell_by_gene"))
    val donors = Seq(("uuid-A", "40", "Male"), ("uuid-B", "55", "Female"))
      .toDF("uuid", "age", "sex")
    val product = operators.ProductBuild.build(modalities, donors,
      s"$tmp/product")
    val rows = product
      .select("dataset", "cell_id", "modality", "feature_id", "value", "age")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getDouble(4), r.getDouble(5))).toSet
    // intersect_obs: A/c2 exists only in cell_by_bin → dropped entirely
    assert(rows === Set(
      ("uuid-A", "c1", "cell_by_bin", "bin1", 1.0, 40.0),
      ("uuid-A", "c1", "cell_by_bin", "bin2", 2.0, 40.0),
      ("uuid-A", "c1", "cell_by_gene", "g2", 5.0, 40.0),
      ("uuid-A", "c3", "cell_by_bin", "bin2", 4.0, 40.0),
      ("uuid-A", "c3", "cell_by_gene", "g1", 6.0, 40.0),
      ("uuid-A", "c3", "cell_by_gene", "g3", 7.0, 40.0),
      ("uuid-B", "c1", "cell_by_bin", "bin1", 9.0, 55.0),
      ("uuid-B", "c1", "cell_by_gene", "g1", 8.0, 55.0)))
    product.unpersist()
  }

  test("DataSource V2: spark.read.format(\"h5ad\") with layout-derived identity") {
    // reference layout: <dataset-uuid>/<modality>.h5ad
    val root = java.nio.file.Files.createTempDirectory("h5ad-dsv2").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/uuid-A"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/uuid-B"))
    MiniHdf5Writer.writeH5ad(s"$root/uuid-A/cell_by_bin.h5ad",
      Seq("c1", "c2"), Seq("b1"), Array(1.0, 2.0), Array(0L, 0L),
      Array(0L, 1L, 2L))
    MiniHdf5Writer.writeH5ad(s"$root/uuid-B/cell_by_gene.h5ad",
      Seq("c9"), Seq("g1", "g2"), Array(3.0, 4.0), Array(0L, 1L),
      Array(0L, 2L), wide = false, gzipChunks = 2)
    val df = spark.read.format("h5ad").load(root)
    val rows = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(2), r.getDouble(3), r.getString(4))).toSet
    assert(rows === Set(
      ("c1", "uuid-A", "b1", 1.0, "cell_by_bin"),
      ("c2", "uuid-A", "b1", 2.0, "cell_by_bin"),
      ("c9", "uuid-B", "g1", 3.0, "cell_by_gene"),
      ("c9", "uuid-B", "g2", 4.0, "cell_by_gene")))

    // one input partition per file
    assert(df.rdd.getNumPartitions === 2)

    // column pruning reaches the reader: a metadata projection scans
    // only the requested columns
    val pruned = df.select("dataset", "modality").distinct()
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("columns [dataset, modality]"),
      s"scan did not prune to the projection:\n$p")
    assert(!p.contains("cell_id"), s"pruned scan still carries cell_id:\n$p")

    // explicit multi-path load + option overrides for flat layouts
    val flat = spark.read.format("h5ad")
      .option("dataset", "dsX").option("modality", "m1")
      .load(s"$root/uuid-A/cell_by_bin.h5ad", s"$root/uuid-B/cell_by_gene.h5ad")
    assert(flat.select("dataset").distinct().as[String].collect().toSeq === Seq("dsX"))
    assert(flat.count() === 4)
  }

  test("chunked + deflate datasets (compression='gzip' layout) read back exactly") {
    // 10 cells × 4 features, 23 nonzeros, 8-element chunks → multi-chunk
    // with a padded tail chunk, plus a single-chunk indptr
    val nnz = 23
    val data = Array.tabulate(nnz)(i => i * 1.5 + 0.25)
    val indices = Array.tabulate(nnz)(i => (i % 4).toLong)
    val indptr = Array[Long](0, 3, 5, 8, 10, 12, 15, 17, 20, 21, 23)
    val obs = (0 until 10).map(i => s"cell$i")
    val vars = (0 until 4).map(i => s"feat$i")
    MiniHdf5Writer.writeH5ad(s"$dir/gz.h5ad", obs, vars, data, indices, indptr,
      wide = true, gzipChunks = 8)
    MiniHdf5Writer.writeH5ad(s"$dir/plain.h5ad", obs, vars, data, indices, indptr,
      wide = true)
    val gz = new MiniHdf5.Reader(s"$dir/gz.h5ad")
    try {
      assert(gz.readDoubles("X/data").toSeq === data.toSeq)
      assert(gz.readLongs("X/indices").toSeq === indices.toSeq)
      assert(gz.readLongs("X/indptr").toSeq === indptr.toSeq)
    } finally gz.close()
    // and the gzip file is actually smaller-or-different on disk while
    // yielding identical triplets
    val a = H5ad.readTriplets(H5adInput(s"$dir/gz.h5ad", "d", "m")).toSeq
    val b = H5ad.readTriplets(H5adInput(s"$dir/plain.h5ad", "d", "m")).toSeq
    assert(a === b && a.size === nnz)
    // narrow chunked (f32/i32) too
    MiniHdf5Writer.writeH5ad(s"$dir/gz32.h5ad", obs, vars, data, indices, indptr,
      wide = false, gzipChunks = 7)
    val gz32 = new MiniHdf5.Reader(s"$dir/gz32.h5ad")
    try {
      assert(gz32.readDoubles("X/data").toSeq === data.map(_.toFloat.toDouble).toSeq)
      assert(gz32.readLongs("X/indices").toSeq === indices.toSeq)
    } finally gz32.close()

    // shuffle+gzip (h5py `compression='gzip', shuffle=True`): the
    // byte-plane transpose must be undone after inflate, both widths
    for (w <- Seq(true, false)) {
      val p = s"$dir/shuf_$w.h5ad"
      MiniHdf5Writer.writeH5ad(p, obs, vars, data, indices, indptr,
        wide = w, gzipChunks = 8, shuffle = true)
      val r = new MiniHdf5.Reader(p)
      try {
        val want = if (w) data.toSeq else data.map(_.toFloat.toDouble).toSeq
        assert(r.readDoubles("X/data").toSeq === want)
        assert(r.readLongs("X/indices").toSeq === indices.toSeq)
        assert(r.readLongs("X/indptr").toSeq === indptr.toSeq)
      } finally r.close()
    }
  }

  test("lzf-compressed chunks round-trip (h5py compression='lzf'), both widths, with shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-lzf").toString
    val nnz = 23
    // repetitive values so lzfCompress emits real back-references, plus
    // a varying tail so literal runs are exercised in the same stream
    val data = Array.tabulate(nnz)(i => if (i < 12) 7.5 else i * 1.25)
    val indices = Array.tabulate(nnz)(i => (i % 4).toLong)
    val indptr = Array[Long](0, 3, 5, 8, 10, 12, 15, 17, 20, 21, 23)
    val obs = (0 until 10).map(i => s"cell$i")
    val vars = (0 until 4).map(i => s"feat$i")
    for (w <- Seq(true, false); sh <- Seq(false, true)) {
      val p = s"$dir/lzf_${w}_$sh.h5ad"
      MiniHdf5Writer.writeH5ad(p, obs, vars, data, indices, indptr,
        wide = w, gzipChunks = 8, shuffle = sh, lzf = true)
      val r = new MiniHdf5.Reader(p)
      try {
        val want = if (w) data.toSeq else data.map(_.toFloat.toDouble).toSeq
        assert(r.readDoubles("X/data").toSeq === want, s"wide=$w shuffle=$sh")
        assert(r.readLongs("X/indices").toSeq === indices.toSeq)
        assert(r.readLongs("X/indptr").toSeq === indptr.toSeq)
      } finally r.close()
    }
  }

  test("zstd-compressed chunks round-trip (hdf5plugin.Zstd), both widths, with shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-zstd").toString
    val nnz = 23
    val data = Array.tabulate(nnz)(i => if (i < 12) 7.5 else i * 1.25)
    val indices = Array.tabulate(nnz)(i => (i % 4).toLong)
    val indptr = Array[Long](0, 3, 5, 8, 10, 12, 15, 17, 20, 21, 23)
    val obs = (0 until 10).map(i => s"cell$i")
    val vars = (0 until 4).map(i => s"feat$i")
    for (w <- Seq(true, false); sh <- Seq(false, true)) {
      val p = s"$dir/zstd_${w}_$sh.h5ad"
      MiniHdf5Writer.writeH5ad(p, obs, vars, data, indices, indptr,
        wide = w, gzipChunks = 8, shuffle = sh, zstd = true)
      val r = new MiniHdf5.Reader(p)
      try {
        val want = if (w) data.toSeq else data.map(_.toFloat.toDouble).toSeq
        assert(r.readDoubles("X/data").toSeq === want, s"wide=$w shuffle=$sh")
        assert(r.readLongs("X/indices").toSeq === indices.toSeq)
        assert(r.readLongs("X/indptr").toSeq === indptr.toSeq)
      } finally r.close()
    }
  }

  test("fletcher32 checksums verify and strip; corruption fails by name") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-fletch").toString
    val data = Array.tabulate(23)(i => i * 0.5)
    val indices = Array.tabulate(23)(i => (i % 4).toLong)
    val indptr = Array[Long](0, 3, 5, 8, 10, 12, 15, 17, 20, 21, 23)
    val obs = (0 until 10).map(i => s"cell$i")
    val vars = (0 until 4).map(i => s"feat$i")
    // over every compressor (the checksum covers the compressed bytes)
    for ((lz, zs) <- Seq((false, false), (true, false), (false, true))) {
      val p = s"$dir/fl_${lz}_$zs.h5ad"
      MiniHdf5Writer.writeH5ad(p, obs, vars, data, indices, indptr,
        gzipChunks = 8, lzf = lz, zstd = zs, fletcher32 = true)
      val r = new MiniHdf5.Reader(p)
      try {
        assert(r.readDoubles("X/data").toSeq === data.toSeq, s"lzf=$lz zstd=$zs")
        assert(r.readLongs("X/indptr").toSeq === indptr.toSeq)
      } finally r.close()
    }
    // a flipped payload byte is caught by the checksum with a named error
    val payload = Array.tabulate(40)(i => (i * 7).toByte)
    val ck = MiniHdf5.fletcher32(payload, payload.length)
    val withCk = payload ++ Array[Byte](ck.toByte, (ck >> 8).toByte,
      (ck >> 16).toByte, (ck >> 24).toByte)
    assert(MiniHdf5.fletcherStrip(withCk, "t").toSeq === payload.toSeq)
    val corrupt = withCk.clone()
    corrupt(10) = (corrupt(10) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](
      MiniHdf5.fletcherStrip(corrupt, "t"))
    assert(e.getMessage.contains("fletcher32 checksum mismatch"), e.getMessage)
    // a chunk shorter than its own checksum is refused, not sliced
    val e2 = intercept[IllegalArgumentException](
      MiniHdf5.fletcherStrip(Array[Byte](1, 2), "t"))
    assert(e2.getMessage.contains("shorter"), e2.getMessage)
  }

  test("HDF5 fletcher32 checksum pins the reference algorithm") {
    // H5_checksum_fletcher32 reference values: big-endian 16-bit words,
    // mod-65535 folds. Empty data -> 0.
    assert(MiniHdf5.fletcher32(Array.emptyByteArray, 0) === 0L)
    // single byte 0xAB: sum1 = 0xAB00, sum2 = sum1
    assert(MiniHdf5.fletcher32(Array(0xAB.toByte), 1) === 0xAB00AB00L)
    // two bytes 0x01 0x02 -> word 0x0102, sum2 = sum1 = 0x0102
    assert(MiniHdf5.fletcher32(Array[Byte](1, 2), 2) === 0x01020102L)
    // four bytes: words 0x0102, 0x0304; sum1 = 0x0406, sum2 = 0x0508
    assert(MiniHdf5.fletcher32(Array[Byte](1, 2, 3, 4), 4) === 0x05080406L)
  }

  test("lzf decompressor: handcrafted streams pin the format byte-for-byte") {
    def dec(bytes: Int*) = MiniHdf5.lzfDecompress(
      bytes.map(_.toByte).toArray, 64, "test").toSeq.map(_ & 0xff)
    // pure literal run: ctrl=2 -> 3 literals
    assert(dec(0x02, 10, 20, 30) === Seq(10, 20, 30))
    // back-reference: 3 literals then match len 3 (ctrl>>5=1 -> 1+2),
    // distance d=2 -> ref = op-3 (copies bytes 0..2)
    assert(dec(0x02, 1, 2, 3, 0x20 | 0x00, 0x02) === Seq(1, 2, 3, 1, 2, 3))
    // SELF-OVERLAPPING match: 1 literal, then len code 3 (-> 5 copies)
    // at distance 0 -> ref = op-1, the classic run encoding
    assert(dec(0x00, 9, 0x60 | 0x00, 0x00) === Seq.fill(6)(9))
    // extended length: len code 7 + ext 1 -> match length 10
    assert(dec(0x00, 4, 0xE0, 0x01, 0x00) === Seq.fill(11)(4))
    // corruption fails loudly, never writes out of bounds
    val e = intercept[IllegalArgumentException] {
      MiniHdf5.lzfDecompress(Array[Byte](0x20, 0x05), 64, "test")
    }
    assert(e.getMessage.contains("corrupt LZF"))
  }

  test("unsupported filter pipelines are refused by name before any data read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-filters").toString
    val data = Array(1.0, 2.0, 3.0)
    val indices = Array(0L, 1L, 0L)
    val indptr = Array(0L, 2L, 3L)
    for ((id, name) <- Seq(4 -> "szip", 6 -> "scaleoffset", 32001 -> "blosc")) {
      val p = s"$dir/$name.h5ad"
      MiniHdf5Writer.writeH5ad(p, Seq("c1", "c2"), Seq("f1", "f2"),
        data, indices, indptr, gzipChunks = 2,
        foreignFilter = Some((id, name)))
      val r = new MiniHdf5.Reader(p)
      try {
        val e = intercept[IllegalArgumentException](r.readDoubles("X/data"))
        // the refusal names the filter and carries the one-time rewrite
        // instruction — the operational path for szip/blosc-compressed
        // uploads this reader deliberately does not decode
        assert(e.getMessage.contains(name), e.getMessage)
        assert(e.getMessage.contains("re-write"), e.getMessage)
      } finally r.close()
    }
    // unregistered id: still loud, by number
    val p2 = s"$dir/custom.h5ad"
    MiniHdf5Writer.writeH5ad(p2, Seq("c1", "c2"), Seq("f1", "f2"),
      data, indices, indptr, gzipChunks = 2,
      foreignFilter = Some((40000, "acme")))
    val r2 = new MiniHdf5.Reader(p2)
    try {
      val e = intercept[IllegalArgumentException](r2.readDoubles("X/data"))
      assert(e.getMessage.contains("40000"), e.getMessage)
    } finally r2.close()
  }

  test("corrupt CSR structure fails loudly instead of dropping rows") {
    // decreasing indptr: row 1's range is empty, row 0 truncated — both
    // silent data loss without validation
    MiniHdf5Writer.writeH5ad(s"$dir/bad.h5ad",
      obsNames = Seq("c1", "c2"), varNames = Seq("f1", "f2"),
      data = Array(1.0, 2.0, 3.0), indices = Array(0L, 1L, 0L),
      indptr = Array(0L, 3L, 1L))
    val e = intercept[IllegalArgumentException](
      H5ad.readTriplets(H5adInput(s"$dir/bad.h5ad", "d", "m")).toSeq)
    assert(e.getMessage.contains("indptr"))
    // truncating indptr (end != nnz) also refuses
    MiniHdf5Writer.writeH5ad(s"$dir/bad2.h5ad",
      obsNames = Seq("c1", "c2"), varNames = Seq("f1", "f2"),
      data = Array(1.0, 2.0, 3.0, 4.0), indices = Array(0L, 1L, 0L, 1L),
      indptr = Array(0L, 2L, 2L))
    val e2 = intercept[IllegalArgumentException](
      H5ad.readTriplets(H5adInput(s"$dir/bad2.h5ad", "d", "m")).toSeq)
    assert(e2.getMessage.contains("nnz"))
  }

  test("unsupported-feature errors name the limitation, not a parse crash") {
    val bogus = java.nio.file.Files.createTempFile("not-hdf5", ".h5ad")
    java.nio.file.Files.write(bogus, "definitely not hdf5".getBytes)
    val e = intercept[IllegalArgumentException](
      new MiniHdf5.Reader(bogus.toString))
    assert(e.getMessage.contains("not an HDF5 file"))
    val r = new MiniHdf5.Reader(files.head.path)
    try {
      val miss = intercept[IllegalArgumentException](r.readLongs("X/nope"))
      assert(miss.getMessage.contains("no object 'nope'"))
    } finally r.close()
  }
}
