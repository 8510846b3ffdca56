package graft

import graft.examples.{AviMjpegFixture, AviMjpegFrameDecoder}

/** The real-codec SPI path, EXECUTED — closing the "no example plugin
  * jar is built anywhere reproducible" gap: the in-tree MJPEG-AVI
  * decoder ([[graft.examples.AviMjpegFrameDecoder]], a genuine video
  * container format decoded with JDK-only machinery) is packaged into a
  * plugin jar by THIS spec, handed to a fresh forked JVM via
  * `SparkContext.addJar`, and proven to flow real frames through
  * `Multimodal.sampleFrames` with `decode_ok = true`.
  *
  * Why a forked JVM: `FrameDecoder.registered` is a per-JVM lazy — in
  * this suite's shared session another Multimodal test may have frozen
  * it as empty long ago — and the deployment-shaped claim under test is
  * precisely that a jar arriving through Spark's MUTABLE task-thread
  * context classloader (the round-10 classloader fix) is discovered.
  * The services registration file exists ONLY inside the built jar, so
  * discovery cannot leak through the system classpath.
  * (VideoCodecIntegrationSpec stays the env-gated hook for deployments
  * proving THEIR codec/container; this spec is the in-tree proof.) */
class FrameDecoderPluginSpec extends SparkSpec {

  private val grays = Seq(16, 48, 80, 112, 144, 176, 208, 240)

  private def buildFixture(): java.nio.file.Path = {
    val avi = java.nio.file.Files.createTempFile("graft-mjpeg", ".avi")
    AviMjpegFixture.write(avi, grays)
    avi
  }

  test("AviMjpegFrameDecoder decodes the RIFF container directly") {
    val avi = buildFixture()
    val bytes = java.nio.file.Files.readAllBytes(avi)
    val frames = new AviMjpegFrameDecoder().decodeFrames(bytes, 4)
    assert(frames.nonEmpty, "decoder must claim its own container")
    val fs = frames.get
    assert(fs.map(_.frameCount) == Seq(8, 8, 8, 8))
    assert(fs.map(_.frameIndex) == Seq(0, 2, 4, 6))
    // uniform-gray frames brighten monotonically; JPEG round-trip moves
    // levels slightly but preserves order and rough magnitude
    val lums = fs.map(_.luminance)
    assert(lums == lums.sorted && lums.distinct.size == 4, lums.toString)
    fs.zip(Seq(16, 80, 144, 208)).foreach { case (f, g) =>
      assert(math.abs(f.luminance - g / 255.0f) < 0.08f,
        s"frame ${f.frameIndex}: luminance ${f.luminance} vs gray $g")
    }
    // SPI contract: foreign bytes are declined, not errored
    assert(new AviMjpegFrameDecoder()
      .decodeFrames("GIF89a not an avi".getBytes, 4).isEmpty)
    assert(new AviMjpegFrameDecoder()
      .decodeFrames(Array.emptyByteArray, 4).isEmpty)
  }

  test("the packaged plugin jar engages through addJar in a fresh JVM") {
    val avi = buildFixture()
    // ---- package the plugin jar: decoder classes + SPI registration
    val testClasses = new java.io.File(
      "target/scala-2.13/test-classes").getAbsoluteFile
    val classFiles = {
      val dir = new java.io.File(testClasses, "graft/examples")
      dir.listFiles((_, n) => n.startsWith("AviMjpegFrameDecoder") &&
        n.endsWith(".class")).toSeq
    }
    assert(classFiles.nonEmpty, s"decoder classes not found under $testClasses")
    val jar = java.nio.file.Files.createTempFile("graft-avi-plugin", ".jar")
    val jos = new java.util.jar.JarOutputStream(
      java.nio.file.Files.newOutputStream(jar))
    try {
      classFiles.foreach { f =>
        jos.putNextEntry(new java.util.zip.ZipEntry(
          s"graft/examples/${f.getName}"))
        jos.write(java.nio.file.Files.readAllBytes(f.toPath))
        jos.closeEntry()
      }
      jos.putNextEntry(new java.util.zip.ZipEntry(
        "META-INF/services/graft.llm.FrameDecoder"))
      jos.write("graft.examples.AviMjpegFrameDecoder\n".getBytes("UTF-8"))
      jos.closeEntry()
    } finally jos.close()

    // ---- fork the proof JVM (mirrors build.sbt's Spark-on-JDK17 flags);
    // classpath = spark jars + graft + test-classes for the runner — the
    // PLUGIN JAR IS DELIBERATELY ABSENT (it travels via addJar only)
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
    val cp = Seq("/opt/spark/jars/*",
      new java.io.File("target/scala-2.13/classes").getAbsolutePath,
      testClasses.getPath).mkString(":")
    val cmd: Seq[String] = Seq(javaBin.getPath) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC", "-Dfile.encoding=UTF-8",
      "-cp", cp, "graft.examples.AviPluginProof",
      jar.toString, avi.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("LANG", "C.UTF-8")
    pb.environment().put("LC_ALL", "C.UTF-8")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val finished = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    assert(finished, "plugin-proof JVM timed out")
    assert(proc.exitValue() == 0 && out.contains("PLUGIN-PROOF-OK"),
      s"plugin proof failed (exit ${proc.exitValue()}):\n${out.takeRight(4000)}")
  }
}
