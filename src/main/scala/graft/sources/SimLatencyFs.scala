package graft.sources

import org.apache.hadoop.fs.{FSDataInputStream, Path => HPath, RawLocalFileSystem}

import java.net.URI

/** SIMULATION-ONLY Hadoop FileSystem: local files served under the
  * `simfs://` scheme with a configurable per-open latency
  * (`fs.simfs.open.latency.ms`), approximating an object store's per-GET
  * first-byte latency — the one deployment property a warm local page
  * cache cannot reproduce (r15 verdict, finding 4: both object-store
  * claims were "argued via network-I/O only" because every local re-read
  * after the first is memory-speed).
  *
  * Register with
  * `spark.hadoop.fs.simfs.impl = graft.sources.SimLatencyFileSystem` and
  * read `simfs:///abs/path` — every file OPEN (parquet footer read, then
  * each column-chunk stream) pays the latency, exactly like an S3 GET per
  * ranged read. Metadata ops (list/status) are left at local speed: a
  * conservative under-estimate of object-store cost, so measured wins are
  * lower bounds. Used by [[graft.tools.ObjectStoreLatencyBench]]; never on
  * a production path.
  */
final class SimLatencyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "simfs"
  override def getUri: URI = URI.create("simfs:///")

  override def open(f: HPath, bufferSize: Int): FSDataInputStream = {
    val lat = getConf.getLong("fs.simfs.open.latency.ms", 0L)
    if (lat > 0) Thread.sleep(lat)
    super.open(f, bufferSize)
  }
}
