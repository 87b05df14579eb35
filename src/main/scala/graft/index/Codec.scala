package graft.index

/** Posting-list compression: delta-gap + variable-byte (varint) encoding,
  * the layout the north rule requires ("delta-gap + variable-byte
  * compressed segments"). Public-knowledge format (same family as Lucene /
  * Tantivy posting blocks): docIds are sorted ascending, stored as varint
  * gaps (first value absolute); term frequencies as plain varints.
  *
  * Pure JVM byte juggling — used inside `mapPartitions` segment writers and
  * readers, never on the driver for bulk data.
  */
object Codec {

  /** Unsynchronized growable byte sink — ByteArrayOutputStream's `write`
    * is synchronized, and with one lock acquisition PER VARINT BYTE it was
    * the hottest single frame of the segment build (JFR leaf profile).
    * Same API surface as the hot path needs, zero locking. */
  final class ByteBuf(initial: Int = 16) {
    private var buf = new Array[Byte](math.max(initial, 4))
    private var len = 0
    @inline def write(b: Int): Unit = {
      if (len == buf.length) grow(len + 1)
      buf(len) = b.toByte; len += 1
    }
    def write(src: Array[Byte], off: Int, n: Int): Unit = {
      if (len + n > buf.length) grow(len + n)
      System.arraycopy(src, off, buf, len, n); len += n
    }
    def toByteArray: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    def size: Int = len
    private def grow(min: Int): Unit = {
      var c = buf.length * 2
      if (c < min) c = min
      buf = java.util.Arrays.copyOf(buf, c)
    }
  }

  /** Unsigned LEB128 varint append (lock-free sink — the hot path). */
  def writeVarLong(out: ByteBuf, value: Long): Unit = {
    var v = value
    require(v >= 0, s"varint requires non-negative, got $value")
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  /** One value as a standalone varint byte array (allocation-free path
    * for single-element streams — no ByteArrayOutputStream). */
  def encodeVarLong(value: Long): Array[Byte] = {
    require(value >= 0, s"varint requires non-negative, got $value")
    var v = value
    var len = 1
    while ((v >>> 7) != 0) { len += 1; v >>>= 7 }
    val b = new Array[Byte](len)
    v = value
    var i = 0
    while ((v & ~0x7FL) != 0L) {
      b(i) = ((v & 0x7F) | 0x80).toByte; v >>>= 7; i += 1
    }
    b(i) = v.toByte
    b
  }

  /** Encode sorted docIds as delta gaps, varint packed. */
  def encodeDeltas(sorted: Array[Long]): Array[Byte] = {
    val out = new ByteBuf(sorted.length * 2)
    var prev = 0L
    var first = true
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      if (first) { writeVarLong(out, v); first = false }
      else {
        require(v > prev, s"docIds must be strictly ascending: $prev -> $v")
        writeVarLong(out, v - prev)
      }
      prev = v
      i += 1
    }
    out.toByteArray
  }

  /** Encode tf values (parallel to docIds) as plain varints. */
  def encodeVarints(values: Array[Long]): Array[Byte] = {
    val out = new ByteBuf(values.length * 2)
    var i = 0
    while (i < values.length) { writeVarLong(out, values(i)); i += 1 }
    out.toByteArray
  }

  /** Decode `n` varints from bytes. */
  def decodeVarints(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0
    var i = 0
    while (i < n) {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        v |= (b & 0x7FL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      out(i) = v
      i += 1
    }
    out
  }

  /** Decode delta-gap encoded docIds back to absolute values. */
  def decodeDeltas(bytes: Array[Byte], n: Int): Array[Long] = {
    val gaps = decodeVarints(bytes, n)
    var i = 1
    while (i < n) { gaps(i) += gaps(i - 1); i += 1 }
    gaps
  }

  /** Cursor-style varint reader for streams of concatenated lists (e.g.
    * per-posting position lists packed back to back in one byte array). */
  final class VarIntReader(bytes: Array[Byte]) {
    private var pos = 0
    def hasNext: Boolean = pos < bytes.length
    def readVarLong(): Long = {
      var shift = 0
      var v = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xFF
        v |= (b & 0x7FL) << shift
        shift += 7
        pos += 1
      } while ((b & 0x80) != 0)
      v
    }
    /** Skip n varint values, returning their raw byte slice verbatim —
      * used to re-partition concatenated per-posting position lists
      * without decode/re-encode. */
    def readRawList(n: Int): Array[Byte] = {
      val start = pos
      var i = 0
      while (i < n) {
        while ((bytes(pos) & 0x80) != 0) pos += 1
        pos += 1
        i += 1
      }
      java.util.Arrays.copyOfRange(bytes, start, pos)
    }

    /** Read one delta-encoded ascending list of length n. */
    def readDeltaList(n: Int): Array[Int] = {
      val out = new Array[Int](n)
      var acc = 0L
      var i = 0
      while (i < n) {
        acc = if (i == 0) readVarLong() else acc + readVarLong()
        out(i) = acc.toInt
        i += 1
      }
      out
    }
  }
}
