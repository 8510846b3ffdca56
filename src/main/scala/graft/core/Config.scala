package graft.core

/** Dataset / archive configuration — SURVEY.md S5, FIXTURES.md §5.
  *
  * The reference stores per-dataset `config.yml` and archive-level
  * `archive.yml` (ftm_datalake/archive/base.py:56-66, dataset.py:76-83).
  * Config is driver-side metadata, not data-plane; this is a minimal
  * dependency-free reader for the flat `key: value` + one-level-nested
  * subset those files actually use (no dependency may be added to the
  * build, so no full YAML engine).
  */
object Config {

  final case class DatasetConfig(
      name: String,
      title: Option[String] = None,
      prefix: Option[String] = None,
      metadataPrefix: String = ".ftm_datalake",
      checksumAlgorithm: String = "sha1",
      publicUrl: Option[String] = None,
      storageUri: Option[String] = None,
      extra: Map[String, String] = Map.empty)

  /** Parse the flat/nested `key: value` subset of the RFC config files. */
  def parseYamlish(text: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var section: Option[String] = None
    text.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      if (noComment.trim.nonEmpty && noComment.contains(":")) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        val Array(k, v @ _*) = noComment.split(":", 2)
        val key = k.trim
        val value = v.mkString.trim.stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
        if (!indented) {
          if (value.isEmpty) section = Some(key)
          else { section = None; out(key) = value }
        } else if (value.nonEmpty) {
          out(section.map(s => s"$s.$key").getOrElse(key)) = value
        }
      }
    }
    out.toMap
  }

  def datasetConfig(text: String): DatasetConfig = {
    val m = parseYamlish(text)
    // both the current `ftm_datalake:` and legacy `leakrfc:` section names
    // appear in the wild (mid-rename fixtures, SURVEY.md §5)
    def arch(key: String): Option[String] =
      m.get(s"ftm_datalake.$key").orElse(m.get(s"leakrfc.$key"))
    DatasetConfig(
      name = m.getOrElse("name", "default"),
      title = m.get("title"),
      prefix = m.get("prefix"),
      metadataPrefix = arch("metadata_prefix").getOrElse(".ftm_datalake"),
      checksumAlgorithm = arch("checksum_algorithm").getOrElse("sha1"),
      publicUrl = arch("public_url"),
      storageUri = m.get("storage.uri"),
      extra = m)
  }

  def loadDatasetConfig(path: String): DatasetConfig =
    datasetConfig(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
