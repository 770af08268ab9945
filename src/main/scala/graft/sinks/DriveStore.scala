package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** In-memory stand-in for the Drive/Monday side of the sinks (the
  * offline harness has no network): folder listing with (parent, name)
  * predicates, duplicate-tolerant creation, file upload, and a status
  * column store. Thread-safe; shared across executor threads in local
  * mode via the [[DriveStore.get]] registry (on a real cluster the
  * equivalent is the external service itself).
  */
class DriveStore {
  final case class Folder(id: Long, parentId: Long, name: String, createdTime: Long)
  final case class File(id: Long, parentId: Long, name: String, size: Long)

  private val seq = new AtomicLong(0L)
  private val clock = new AtomicLong(0L)
  private val folders = new ConcurrentHashMap[Long, Folder]()
  private val files = new ConcurrentHashMap[Long, File]()
  private val statuses = new ConcurrentHashMap[Long, String]()

  /** P6-style listing: parent + exact name, never "trashed" here. */
  def listFolders(parentId: Long, name: String): Seq[Folder] =
    folders.values.asScala.toSeq
      .filter(f => f.parentId == parentId && f.name == name)
      .sortBy(f => (f.createdTime, f.id))

  /** Unconditional create — duplicates allowed, like the real service
    * under racing writers.
    */
  def createFolder(parentId: Long, name: String): Folder = {
    val f = Folder(seq.incrementAndGet(), parentId, name, clock.incrementAndGet())
    folders.put(f.id, f)
    f
  }

  /** K3 `find_or_create_folder_strict` (`Leyton_depot.py:421-456`):
    * list; create when absent; RE-LIST and return the OLDEST by
    * (createdTime, id) so concurrent duplicate creations all converge
    * on one winner.
    */
  def findOrCreateFolder(parentId: Long, name: String): Long = {
    if (listFolders(parentId, name).isEmpty) createFolder(parentId, name)
    listFolders(parentId, name).head.id
  }

  def uploadFile(parentId: Long, name: String, size: Long): Long = {
    val f = File(seq.incrementAndGet(), parentId, name, size)
    files.put(f.id, f)
    f.id
  }

  def fileCount: Int = files.size
  def folderCount: Int = folders.size

  /** K4 `change_status_simple`: last-write-wins status cell. */
  def setStatus(itemId: Long, status: String): Unit = statuses.put(itemId, status)
  def status(itemId: Long): Option[String] = Option(statuses.get(itemId))
}

/** Named-store registry so executor-side closures can reach a store by
  * name in local mode without serializing it.
  */
object DriveStore {
  private val stores = new ConcurrentHashMap[String, DriveStore]()
  def get(name: String): DriveStore = stores.computeIfAbsent(name, _ => new DriveStore)
  def drop(name: String): Unit = stores.remove(name)
}
