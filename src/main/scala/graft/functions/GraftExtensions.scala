package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native registration of graft's custom Catalyst expressions, so they
  * are first-class SQL functions — usable from `spark.sql("…")`, visible to
  * `SHOW FUNCTIONS` / `DESCRIBE FUNCTION`, and codegen'd like any built-in.
  *
  * Two installation paths:
  *  - config: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `SparkSession.builder.withExtensions(new GraftExtensions)`) —
  *    the idiomatic cluster deployment: every session on the cluster gets
  *    the functions without code changes;
  *  - [[GraftExtensions.register]] on an already-running session (test and
  *    notebook convenience; same registry, same expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => RewriteMd5Prefix60)
  }
}

object GraftExtensions {

  /** (identifier, catalog info, builder) for every graft SQL function. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, null, "md5_prefix60",
        "md5_prefix60(str) - first 60 bits of md5(str) as a non-negative BIGINT; " +
          "the engine's portable text-hash primitive (equals " +
          "conv(substring(md5(str),1,15),16,10) at ~1/3 the cost).",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"md5_prefix60 expects 1 argument, got ${args.length}")
        Md5Prefix60(args.head)
      }),
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, null, "quantized_dot",
        "quantized_dot(a, b) - exact-integer embedding score: " +
          "sum(floor(a_i*10000)*floor(b_i*10000)) over two float/double arrays as BIGINT.",
        ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"quantized_dot expects 2 arguments, got ${args.length}")
        QuantizedDot(args.head, args(1))
      }),
    unary("simhash16", classOf[SimHash16],
      "simhash16(shingles) - 16-bit SimHash of a string-array (shingle set) as BIGINT; " +
        "near-duplicates bucket by equality.", SimHash16(_)),
    unary("simhash64", classOf[SimHash64],
      "simhash64(shingles) - 64-bit SimHash of a string-array (shingle set) as BIGINT " +
        "(bit 63 set => negative); production fingerprint width.", SimHash64(_)),
    unary("media_dims", classOf[MediaDims],
      "media_dims(bin) - struct<format,width,height> parsed from a PNG/GIF/JPEG/BMP " +
        "header, NULL if unrecognized/truncated.", MediaDims(_)),
    unary("audio_meta", classOf[AudioMeta],
      "audio_meta(bin) - struct<format,channels,sample_rate,bits,duration_ms> from a " +
        "WAV/FLAC header, NULL if unrecognized/truncated.", AudioMeta(_)),
    unary("script_mix", classOf[ScriptMix],
      "script_mix(str) - struct of per-script codepoint counts (ascii letter/digit/" +
        "whitespace/punct, latin_ext, cyrillic, arabic, cjk, hangul, other) over a " +
        "declared fixed range table.", ScriptMix(_)),
    unary("utf8_stats", classOf[Utf8Stats],
      "utf8_stats(bin) - struct<n_bytes,n_chars,n_invalid,n_replacement> over a " +
        "raw payload: strict RFC 3629 walk, per-byte resync, U+FFFD mojibake count.",
      Utf8Stats(_)),
    unary("audio_pcm_stats", classOf[AudioPcmStats],
      "audio_pcm_stats(bin) - struct<n_samples,peak,sum_sq> over a 16-bit PCM " +
        "WAV's samples (exact integers), NULL if not PCM16/unparseable.",
      AudioPcmStats(_)),
    unary("video_meta", classOf[VideoMeta],
      "video_meta(bin) - struct<brand,timescale,duration,duration_ms> from an " +
        "ISO-BMFF (MP4/MOV) header, NULL if unrecognized/truncated.", VideoMeta(_)),
    unary("compression_ratio", classOf[CompressionRatio],
      "compression_ratio(str|bin) - deflate(level 6) size in basis points of raw " +
        "size; low values flag repetitive machine-generated text.", CompressionRatio(_)),
    (FunctionIdentifier("minhash_k"),
      new ExpressionInfo(classOf[MinHashK].getName, null, "minhash_k",
        "minhash_k(shingles, k) - array of k MinHash values over a string-array " +
          "(shingle set); k must be a literal INT.", ""),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"minhash_k expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_k's k must be a literal INT, got $other")
        }
        MinHashK(args.head, k)
      }))
  // NOT registered: BloomMightContain, NearestCentroid, PqEncode, AdcDist —
  // they carry driver-built plan objects (a bloom filter, centroid/codebook
  // matrices) that have no SQL-literal form; they are Column combinators only.

  private def unary(name: String, cls: Class[_], usage: String,
                    build: Expression => Expression):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(cls.getName, null, name, usage, ""),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        build(args.head)
      })

  /** Register into a live session's function registry (idempotent). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
