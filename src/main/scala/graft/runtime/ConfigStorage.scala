package graft.runtime

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Pluggable storage for pipeline registrations — the analog of
  * `Broadway.ConfigStorage` (/root/reference/lib/broadway/config_storage.ex:1-44):
  * the reference selects `:persistent_term`, `:ets`, or a custom module via
  * application config; here the backend is an ordinary trait instance
  * installed on [[PipelineRegistry]] before pipelines start. The stored
  * value is the [[graft.core.RunningPipeline]] handle (the repo's
  * `%Broadway.Topology{}` analog).
  *
  * Contract mirrors the reference callbacks: `setup/0`, `list/0`, `put/2`,
  * `get/1`, `delete/1` (CRUD over name → topology, exercised by
  * test/broadway/config_storage_test.exs:1-27).
  */
trait ConfigStorage {

  /** Optional one-time initialization (reference `setup/0`, optional
    * callback). Invoked when the backend is installed.
    */
  def setup(): Unit = ()

  /** All registered pipeline names. */
  def list(): Seq[String]

  def put(name: String, pipeline: graft.core.RunningPipeline[_]): Unit

  def get(name: String): Option[graft.core.RunningPipeline[_]]

  /** Remove a registration; true if it existed. */
  def delete(name: String): Boolean
}

/** Default backend: a process-local ConcurrentHashMap — the
  * `:persistent_term` analog (fast, in-process, no external state).
  */
final class InMemoryConfigStorage extends ConfigStorage {
  private val entries = new ConcurrentHashMap[String, graft.core.RunningPipeline[_]]()

  override def list(): Seq[String] = entries.keySet().asScala.toSeq.sorted
  override def put(name: String, pipeline: graft.core.RunningPipeline[_]): Unit = {
    entries.put(name, pipeline); ()
  }
  override def get(name: String): Option[graft.core.RunningPipeline[_]] =
    Option(entries.get(name))
  override def delete(name: String): Boolean = entries.remove(name) != null
}

/** File-mirrored backend: handles stay in-process (a running pipeline is
  * not meaningful across JVMs), but each registration also writes a
  * descriptor file `<dir>/<name>.json` (name + producers + batchers) and
  * `list()` reads the DIRECTORY — so an operator or sidecar process can
  * see what this driver is running without attaching to it, the
  * cross-process-introspection role `:ets`/`:persistent_term` play on the
  * BEAM where any process can read another's registrations. Descriptors
  * are removed on delete; a stale file from a crashed driver is evidence
  * (intentionally not auto-cleaned), matching how persistent_term state
  * survives a crashed supervisor until the node restarts.
  */
final class FileBackedConfigStorage(dir: Path) extends ConfigStorage {
  def this(dir: String) = this(Paths.get(dir))

  private val entries = new ConcurrentHashMap[String, graft.core.RunningPipeline[_]]()

  override def setup(): Unit = { Files.createDirectories(dir); () }

  private def fileOf(name: String): Path = {
    // pipeline names become file names — reject separators instead of
    // silently escaping the directory
    require(!name.contains('/') && !name.contains('\u0000'), s"unsafe pipeline name: $name")
    dir.resolve(s"$name.json")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  override def list(): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // Files.list opens a DirectoryStream that MUST be closed — leaking
      // one fd per allRunning/drainAll poll exhausts the process limit
      // on a long-running driver
      val stream = Files.list(dir)
      try
        stream
          .iterator()
          .asScala
          .map(_.getFileName.toString)
          .filter(_.endsWith(".json"))
          .map(_.stripSuffix(".json"))
          .toSeq
          .sorted
      finally stream.close()
    }

  // put/delete are synchronized: they each touch the map AND the
  // directory, and without mutual exclusion a concurrent re-register +
  // stop of the same name can interleave into a live in-memory handle
  // with no descriptor (hidden from list()/drainAll) or a descriptor
  // with no handle
  override def put(name: String, pipeline: graft.core.RunningPipeline[_]): Unit =
    synchronized {
      // validate + write the descriptor BEFORE touching the in-memory
      // map: a name-validation or I/O failure must not leave a
      // registration that get() sees but list()/drainAll
      // (directory-backed) never will
      val file = fileOf(name)
      val topo = pipeline.topology
      val desc =
        s"""{"name":${jsonStr(name)},"producers":[${pipeline.producerNames.map(jsonStr).mkString(",")}],""" +
          s""""batchers":[${topo.batchers.map(b => jsonStr(b.name)).mkString(",")}]}"""
      // temp + ATOMIC_MOVE: the whole point of this backend is an
      // EXTERNAL reader, which must never observe a torn half-written
      // descriptor during a re-registration overwrite
      val tmp = dir.resolve(s"$name.json.tmp")
      Files.write(tmp, desc.getBytes(StandardCharsets.UTF_8))
      Files.move(
        tmp,
        file,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING
      )
      entries.put(name, pipeline)
      ()
    }

  override def get(name: String): Option[graft.core.RunningPipeline[_]] =
    Option(entries.get(name))

  override def delete(name: String): Boolean = synchronized {
    // validate first for the same memory/disk-coherence reason as put
    val file = fileOf(name)
    val had = entries.remove(name) != null
    val hadFile = Files.deleteIfExists(file)
    had || hadFile
  }
}
