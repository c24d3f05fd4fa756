package graft.queries

/** The stage-once discipline shared by every marker-keyed corpus-prep
  * block (j2's nested source, u7/u10's snapshots, the near-dup pair
  * table): the staged artifact is rebuilt only when `key` — derived
  * from the SOURCE file's identity — changes, and the key is recorded
  * only after the write completes, so an interrupted write re-stages
  * on the next run. The key file starts with an underscore, which
  * Spark's file readers ignore, so it can live inside a parquet dir.
  */
object Staging {

  def stageOnce(dir: String, key: String)(write: => Unit): Unit = {
    val keyFile = java.nio.file.Paths.get(dir, "_STAGED_KEY")
    val reusable = java.nio.file.Files.exists(keyFile) &&
      java.nio.file.Files.readString(keyFile) == key
    if (!reusable) {
      write
      java.nio.file.Files.createDirectories(keyFile.getParent)
      java.nio.file.Files.writeString(keyFile, key)
    }
  }

  /** Source-version key: path + mtime + size of the backing parquet. */
  def sourceKey(sfDir: String, table: String, salt: String = ""): String = {
    val f = new java.io.File(sfDir, s"$table.parquet")
    s"$sfDir:${f.lastModified}:${f.length}$salt"
  }
}
