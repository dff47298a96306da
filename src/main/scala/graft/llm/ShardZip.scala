package graft.llm

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, InflaterInputStream}

/** Minimal read-only ZIP central-directory reader over an in-memory shard.
  *
  * Why not `java.util.zip.ZipFile`: the JDK's random-access ZIP reader is
  * FILE-based, which forced [[Multimodal.frameSampleShard]] to spill every
  * payload to a partition-local scratch file (one create/write/delete per
  * container — 50k syscall triples at the ×10 stress scale) before it could
  * seek. The shard format itself needs none of that: ZIP's index is the
  * central directory at EOF (public format, APPNOTE.TXT), so a reader can
  * touch exactly three byte ranges — the end-of-central-directory record,
  * the directory, and each SAMPLED entry's local span — and never look at
  * the rest of the container. Over a byte array those are array slices;
  * over an object store they are the SAME three ranged GETs (tail range
  * for the directory, one range per sampled entry), which is precisely the
  * WebDataset-shard access pattern the sampling cost model assumes. Bytes
  * touched track k, not container size — now by construction, not by
  * scratch-file analogy.
  *
  * Scope: exactly what our shards need — no ZIP64 (shards are bounded well
  * under 4 GiB / 65k entries by the writer), no encryption, no spanning;
  * stored (0) and deflated (8) methods. Sizes come from the CENTRAL
  * directory, which `ZipOutputStream` always back-fills — local headers
  * may carry zeros with a trailing data descriptor (general-purpose bit 3)
  * and are only trusted for their own name/extra lengths. Malformed input
  * throws IllegalArgumentException; the poison gate upstream treats that
  * as a reject row like any other codec exception.
  */
object ShardZip {

  /** One central-directory row: everything needed to range-read the entry. */
  final case class Entry(name: String, method: Int, compressedSize: Int,
      localHeaderOffset: Int)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong | (u16(b, i + 2).toLong << 16)) & 0xffffffffL

  private final val EocdSig = 0x06054b50L
  private final val CenSig  = 0x02014b50L
  private final val LocSig  = 0x04034b50L

  /** Parse the central directory (EOCD scan from EOF, then one pass over
    * the directory records) — the only whole-structure read; O(entries),
    * never O(container bytes). Returned in directory order. */
  def entries(bytes: Array[Byte]): IndexedSeq[Entry] = {
    // EOCD = 22 fixed bytes + a comment of up to 65535; scan backward for
    // the signature (our writer emits no comment, but don't assume)
    val floor = math.max(0, bytes.length - 22 - 0xffff)
    var e = bytes.length - 22
    while (e >= floor && u32(bytes, e) != EocdSig) e -= 1
    require(e >= floor && e >= 0, "ShardZip: no end-of-central-directory record")
    val count = u16(bytes, e + 10)
    val cdOff = u32(bytes, e + 16)
    require(cdOff + 46L * count <= bytes.length,
      s"ShardZip: central directory out of bounds (off=$cdOff count=$count)")
    val out = new Array[Entry](count)
    var p = cdOff.toInt
    var i = 0
    while (i < count) {
      // per-record bounds BEFORE any field read: variable-length parts
      // shift every later record, so the up-front directory-size check
      // cannot cover a corrupt name/extra/comment length mid-walk — the
      // contract is IllegalArgumentException, never an index error
      require(p >= 0 && p + 46 <= bytes.length,
        s"ShardZip: directory record truncated at $p")
      require(u32(bytes, p) == CenSig, s"ShardZip: bad central header at $p")
      val method = u16(bytes, p + 10)
      val csize = u32(bytes, p + 20)
      val nameLen = u16(bytes, p + 28)
      val extraLen = u16(bytes, p + 30)
      val commentLen = u16(bytes, p + 32)
      val lho = u32(bytes, p + 42)
      require(csize <= Int.MaxValue && lho <= Int.MaxValue,
        "ShardZip: ZIP64-sized entry in a non-ZIP64 reader")
      require(p + 46L + nameLen + extraLen + commentLen <= bytes.length,
        s"ShardZip: directory record overruns the container at $p")
      out(i) = Entry(new String(bytes, p + 46, nameLen, StandardCharsets.UTF_8),
        method, csize.toInt, lho.toInt)
      p += 46 + nameLen + extraLen + commentLen
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  /** Open entry `e` as a decoded stream: one local-header peek for the
    * name/extra lengths (they can differ from the central copy), then a
    * slice over exactly `compressedSize` bytes — stored passes through,
    * deflated inflates lazily. Caller closes (ends the Inflater). */
  def entryStream(bytes: Array[Byte], e: Entry): InputStream = {
    val p = e.localHeaderOffset
    require(p >= 0 && p + 30 <= bytes.length,
      s"ShardZip: local header truncated at $p")
    require(u32(bytes, p) == LocSig, s"ShardZip: bad local header at $p")
    val dataOff = p + 30 + u16(bytes, p + 26) + u16(bytes, p + 28)
    require(dataOff >= 0 && dataOff + e.compressedSize.toLong <= bytes.length,
      s"ShardZip: entry span out of bounds at $dataOff")
    e.method match {
      case 0 => new ByteArrayInputStream(bytes, dataOff, e.compressedSize)
      case 8 =>
        // raw (nowrap) inflate needs one readable byte PAST the deflate
        // stream to report stream end (Inflater javadoc; the JDK's ZipFile
        // streams append a dummy byte for exactly this) — in a ZIP there is
        // always a next header/directory byte to lend, but clamp anyway
        val lend = if (dataOff + e.compressedSize < bytes.length) 1 else 0
        val raw = new ByteArrayInputStream(bytes, dataOff, e.compressedSize + lend)
        val inf = new Inflater(/*nowrap=*/ true)
        // a caller-supplied Inflater is NOT ended by InflaterInputStream
        // .close() — without this override every entry read leaks native
        // zlib window buffers until the Cleaner runs (review-caught)
        new InflaterInputStream(raw, inf) {
          // this.inf == the outer inf (same object, passed to the ctor);
          // the explicit form resolves the Scala-3 legacy-binding ambiguity
          override def close(): Unit = try super.close() finally this.inf.end()
        }
      case m => throw new IllegalArgumentException(
        s"ShardZip: unsupported compression method $m for '${e.name}'")
    }
  }
}
