package graft.core

/** Job configuration — semantic mirror of the reference's pydantic
  * `SmartspimJobSettings` (reference models.py:23-79), re-expressed as a
  * Scala case class validated at the driver.
  *
  * Scale-out note: `numOfPartitions` / `partitionToProcess` exist for
  * parity with the reference's container-level round-robin sharding
  * (smartspim_job.py:30-41, :221-230). Under Spark a single application
  * owns the whole input and the scheduler distributes stacks, so the
  * default (1, 0) processes everything; values > 1 filter the sorted
  * stack list exactly like the reference for multi-cluster sharding.
  */
final case class JobSettings(
    inputSource: String,
    outputDirectory: String,
    s3Location: Option[String] = None,
    numOfPartitions: Int = 1,
    partitionToProcess: Int = 0,
    compressorName: String = "blosc", // only "blosc" or "none" (models.py:17-20)
    compressorLevel: Int = 3,          // zstd clevel (models.py:55-59)
    compressorCname: String = "zstd",  // kwargs.cname; zstd default, lz4 supported
    byteShuffle: Boolean = true,       // Blosc.SHUFFLE default
    chunkSize: Seq[Int] = Seq(128, 128, 128), // models.py:65-69
    scaleFactor: Seq[Int] = Seq(2, 2, 2),     // models.py:70-74
    downsampleLevels: Int = 4,                // models.py:75-79
    // Beyond-reference: zarr v3 / OME-NGFF 0.5 output. 2 (default) is
    // the reference's layout; 3 writes `zarr.json` docs and the
    // `<level>/c/...` key encoding. `shardGrid` (chunks-per-shard
    // Z,Y,X; v3 only) switches levels to `sharding_indexed` — one
    // store object per shard, the v3 answer to object-count explosion
    // on 100 TB object stores.
    zarrFormat: Int = 2,
    shardGrid: Option[Seq[Int]] = None
) {
  require(numOfPartitions >= 1, "num_of_partitions must be >= 1")
  require(partitionToProcess >= 0 && partitionToProcess < numOfPartitions,
    "partition_to_process out of range")
  require(compressorName == "blosc" || compressorName == "none",
    s"unsupported compressor: $compressorName (models.py:17-20 allows blosc only)")
  require(compressorCname == "zstd" || compressorCname == "lz4",
    s"unsupported compressor cname: $compressorCname (zstd, lz4)")
  require(chunkSize.length == 3 && chunkSize.forall(_ > 0), "chunk_size must be 3 positive ints")
  require(scaleFactor.length == 3 && scaleFactor.forall(_ > 0), "scale_factor must be 3 positive ints")
  require(downsampleLevels >= 1, "downsample_levels must be >= 1")
  require(zarrFormat == 2 || zarrFormat == 3, "zarr_format must be 2 or 3")
  require(shardGrid.forall(g => g.length == 3 && g.forall(_ > 0)),
    "shard_grid must be 3 positive ints (chunks per shard, Z,Y,X)")
  require(shardGrid.isEmpty || zarrFormat == 3,
    "shard_grid requires zarr_format = 3 (sharding_indexed is v3-only)")
}

object JobSettings {

  /** Deterministic round-robin list partition: item i → partition
    * i mod n, preserving per-partition order (reference
    * smartspim_job.py:30-41). Pure — property-tested.
    */
  def partitionList[T](lst: Seq[T], numOfPartitions: Int): Seq[Seq[T]] = {
    require(numOfPartitions >= 1)
    (0 until numOfPartitions).map(p =>
      lst.zipWithIndex.collect { case (x, i) if i % numOfPartitions == p => x })
  }

  /** Parse the reference's snake_case settings JSON (the `-j` /
    * `--config-file` payload a pydantic `SmartspimJobSettings` accepts,
    * models.py:23-79): unknown keys ignored, missing keys defaulted,
    * `compressor_kwargs.clevel` mapped to the zstd level. */
  def fromJson(text: String): JobSettings = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(text)
    def str(k: String): Option[String] = (j \ k) match {
      case JString(s) => Some(s); case _ => None
    }
    def int(k: String): Option[Int] = (j \ k) match {
      case JInt(i) => Some(i.toInt); case _ => None
    }
    def ints(k: String): Option[Seq[Int]] = (j \ k) match {
      case JArray(vs) => Some(vs.collect { case JInt(i) => i.toInt }); case _ => None
    }
    val clevel = (j \ "compressor_kwargs" \ "clevel") match {
      case JInt(i) => Some(i.toInt); case _ => None
    }
    // cname: the reference default is zstd (models.py:55-59); the
    // engine also encodes lz4 (numcodecs' default). Anything else is
    // rejected loudly rather than silently written as zstd.
    val cname = (j \ "compressor_kwargs" \ "cname") match {
      case JString(c) if c == "zstd" || c == "lz4" => Some(c)
      case JString(c) => throw new IllegalArgumentException(
        s"unsupported compressor_kwargs.cname: $c (encode path supports zstd, lz4)")
      case _ => None
    }
    // shuffle: c-blosc numeric flags (0 = none, 1 = byte shuffle — the
    // reference default Blosc.SHUFFLE, 2 = bit shuffle, unsupported).
    val shuffleFlag = (j \ "compressor_kwargs" \ "shuffle") match {
      case JInt(i) if i == 0 => Some(false)
      case JInt(i) if i == 1 => Some(true)
      case JInt(i) => throw new IllegalArgumentException(
        s"unsupported compressor_kwargs.shuffle: $i (0 = none, 1 = byte shuffle)")
      case _ => None
    }
    JobSettings(
      inputSource = str("input_source").getOrElse(
        throw new IllegalArgumentException("input_source required")),
      outputDirectory = str("output_directory").getOrElse(
        throw new IllegalArgumentException("output_directory required")),
      s3Location = str("s3_location"),
      numOfPartitions = int("num_of_partitions").getOrElse(1),
      partitionToProcess = int("partition_to_process").getOrElse(0),
      compressorName = str("compressor_name").getOrElse("blosc"),
      compressorLevel = clevel.getOrElse(3),
      compressorCname = cname.getOrElse("zstd"),
      byteShuffle = shuffleFlag.getOrElse(true),
      chunkSize = ints("chunk_size").getOrElse(Seq(128, 128, 128)),
      scaleFactor = ints("scale_factor").getOrElse(Seq(2, 2, 2)),
      downsampleLevels = int("downsample_levels").getOrElse(4),
      zarrFormat = int("zarr_format").getOrElse(2),
      shardGrid = ints("shard_grid"))
  }
}
