package graft.llm

/** SPI for true-video frame decoding. The JDK ships no video codec, so
  * [[Multimodal.sampleFrames]] decodes any `javax.imageio` container
  * (animated GIF foremost) and falls back to a deterministic stub for
  * mp4/webm — a DEPLOYMENT closes that gap by implementing this trait
  * over a real codec (JCodec, an ffmpeg binding, …) and listing the
  * class in `META-INF/services/graft.llm.FrameDecoder`: the frames then
  * flow through the exact same output schema with `decode_ok = true`,
  * no graft change required (the library itself stays dependency-free).
  *
  * Contract: sniff the container (magic bytes) and return `None` when
  * the bytes are not yours — registered decoders are consulted IN
  * `ServiceLoader` ORDER and take precedence over the built-in imageio
  * path, so a deployment can also override GIF handling (e.g. full
  * canvas compositing instead of per-raster luminance). Implementations
  * need a public no-arg constructor; they are instantiated per executor
  * JVM (never serialized from the driver) and must be thread-safe
  * across Spark's task threads. */
trait FrameDecoder {

  /** Decode up to `n` evenly-spaced frames of `bytes`, or `None` when
    * this decoder does not handle the container. */
  def decodeFrames(bytes: Array[Byte], n: Int): Option[Seq[FrameDecoder.Frame]]

  /** Optional richer hook for [[Multimodal.videoFingerprints]]: `n`
    * evenly-spaced frames, each reduced to `bands` top-to-bottom mean
    * luminance bands in [0, 1] (the clip fingerprint's spatial axis).
    * Default `None`: existing luminance-only decoders keep working
    * unchanged, and fingerprinting falls back to the built-in imageio
    * container path (or the stub for codecs nobody decodes). Return
    * `None` also when the container is not yours. Implementations must
    * return exactly `n` frames of `bands` values each — anything else
    * is ignored as malformed and falls through. */
  def decodeFrameBands(bytes: Array[Byte], n: Int,
                       bands: Int): Option[Seq[FrameDecoder.FrameBands]] =
    None
}

object FrameDecoder {

  /** One sampled frame: the container's total frame count, this frame's
    * index, and its mean luminance in [0, 1]. */
  final case class Frame(frameCount: Int, frameIndex: Int, luminance: Float)

  /** One sampled frame with its spatial luminance profile: `bands`
    * top-to-bottom mean-luminance values in [0, 1]. */
  final case class FrameBands(frameCount: Int, frameIndex: Int,
                              bands: Array[Float])

  /** Registered decoders, loaded once per JVM (executor-side — the
    * object is re-initialized there, never shipped).
    *
    * Loaded through the task thread's context classloader: a deployment
    * codec jar added via `--jars`/`addJar` lands in Spark's child
    * (mutable user) classloader, which the executor sets as the context
    * loader for task threads — `classOf[FrameDecoder].getClassLoader`
    * would miss those registrations whenever graft itself sits on the
    * system classpath, silently falling back to the stub. */
  private[graft] lazy val registered: Seq[FrameDecoder] = {
    val loader = Option(Thread.currentThread().getContextClassLoader)
      .getOrElse(classOf[FrameDecoder].getClassLoader)
    val it = java.util.ServiceLoader
      .load(classOf[FrameDecoder], loader)
      .iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[FrameDecoder]
    while (it.hasNext) buf += it.next()
    buf.toSeq
  }
}
