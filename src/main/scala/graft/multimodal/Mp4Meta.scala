package graft.multimodal

import java.nio.{ByteBuffer, charset}

/** Pure-JVM MP4 / ISO-BMFF (ISO 14496-12) container-header parser: a box
  * ("atom") walk that extracts REAL metadata — presentation duration and
  * timescale from `moov/mvhd`, the video track's pixel dimensions from
  * `trak/tkhd` (16.16 fixed-point), and the sample (frame) count from the
  * track's `stbl/stsz`. No frame decode happens here and none is claimed:
  * the JDK has no video codec, so pixel-level work stays out of scope —
  * but duration / dimensions / frame counts for the multimodal pipeline
  * come from actually parsing the container, not from a fake.
  *
  * Parsing is defensive: any structural violation (box overruns its
  * parent, 64-bit `largesize` smaller than its header, missing moov/mvhd)
  * yields None rather than throwing — the decode stage falls back to its
  * quarantine path per row.
  *
  * Box layout parsed (sizes in bytes): `[size:4][type:4][payload]`, with
  * `size==1` ⇒ 64-bit largesize follows the type, `size==0` ⇒ box extends
  * to the end of its container. FullBox payloads start `[version:1][flags:3]`.
  */
object Mp4Meta {

  /** @param durationMs  mvhd duration scaled to milliseconds
    * @param timescale   mvhd timescale (ticks per second)
    * @param width       video track width (0 if no video track)
    * @param height      video track height
    * @param nSamples    stsz sample_count of the video track (frames)
    */
  case class Mp4Info(durationMs: Long, timescale: Long,
      width: Int, height: Int, nSamples: Long)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, charset.StandardCharsets.US_ASCII)

  /** (type, payloadStart, payloadEnd) for each box in [from, to). */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = from
    while (o < to) {
      require(o + 8 <= to, "truncated box header")
      val size32 = be32(b, o)
      val (header, size) =
        if (size32 == 1L) { require(o + 16 <= to, "truncated largesize"); (16L, be64(b, o + 8)) }
        else if (size32 == 0L) (8L, (to - o).toLong) // last box: to end of container
        else (8L, size32)
      require(size >= header && o + size <= to, s"box overruns container at $o")
      out += ((boxType(b, o), o + header.toInt, o + size.toInt))
      o += size.toInt
    }
    out.result()
  }

  private def find(bs: Seq[(String, Int, Int)], t: String): Option[(Int, Int)] =
    bs.collectFirst { case (`t`, s, e) => (s, e) }

  /** Depth-first search for the first box of type `t` anywhere under the
    * given ranges (used for stsz, which nests trak/mdia/minf/stbl).
    */
  private def findDeep(b: Array[Byte], from: Int, to: Int, t: String): Option[(Int, Int)] = {
    val bs = try boxes(b, from, to) catch { case _: IllegalArgumentException => Nil }
    bs.view.flatMap {
      case (`t`, s, e) => Some((s, e))
      case (_, s, e) if e - s >= 8 => findDeep(b, s, e, t)
      case _ => None
    }.headOption
  }

  def parse(bytes: Array[Byte]): Option[Mp4Info] =
    try {
      val top = boxes(bytes, 0, bytes.length)
      // an ftyp brand is what makes the payload claim to be ISO-BMFF at all
      if (find(top, "ftyp").isEmpty) return None
      val (moovS, moovE) = find(top, "moov").getOrElse(return None)
      val moov = boxes(bytes, moovS, moovE)
      val (mvhdS, mvhdE) = find(moov, "mvhd").getOrElse(return None)
      // FullBox: version decides 32- vs 64-bit ctime/mtime/duration
      val (timescale, duration) = bytes(mvhdS) match {
        case 0 =>
          require(mvhdE - mvhdS >= 20, "short mvhd v0")
          (be32(bytes, mvhdS + 12), be32(bytes, mvhdS + 16))
        case 1 =>
          require(mvhdE - mvhdS >= 32, "short mvhd v1")
          (be32(bytes, mvhdS + 20), be64(bytes, mvhdS + 24))
        case v => throw new IllegalArgumentException(s"mvhd version $v")
      }
      require(timescale > 0, "zero mvhd timescale")
      // video track = first trak whose tkhd has nonzero width; its stsz
      // (if present) carries the sample/frame count
      val tracks = moov.collect { case ("trak", s, e) =>
        val trak = boxes(bytes, s, e)
        val dims = find(trak, "tkhd").map { case (ts, te) =>
          val whOff = bytes(ts) match { // width/height close the tkhd payload
            case 0 => require(te - ts >= 84, "short tkhd v0"); ts + 76
            case 1 => require(te - ts >= 96, "short tkhd v1"); ts + 88
            case v => throw new IllegalArgumentException(s"tkhd version $v")
          }
          // 16.16 fixed point
          ((be32(bytes, whOff) >> 16).toInt, (be32(bytes, whOff + 4) >> 16).toInt)
        }
        val samples = findDeep(bytes, s, e, "stsz")
          .map { case (ss, se) => require(se - ss >= 12, "short stsz"); be32(bytes, ss + 8) }
        (dims, samples)
      }
      val video = tracks.find(_._1.exists(_._1 > 0))
      val (w, h) = video.flatMap(_._1).getOrElse((0, 0))
      val n = video.flatMap(_._2).getOrElse(0L)
      Some(Mp4Info(duration * 1000L / timescale, timescale, w, h, n))
    } catch {
      case _: IllegalArgumentException => None
      case _: IndexOutOfBoundsException => None
    }

  // ---- synthetic writer (test/demo fixtures the parser reads back) ----

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val bb = ByteBuffer.allocate(len)
    bb.putInt(len)
    bb.put(typ.getBytes(charset.StandardCharsets.US_ASCII))
    payload.foreach(bb.put)
    bb.array()
  }

  private def bytesOf(f: ByteBuffer => Unit, len: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(len); f(bb); bb.array()
  }

  /** Minimal valid-layout MP4 header: ftyp + moov(mvhd, trak(tkhd,
    * mdia(minf(stbl(stsz))))) with version-0 FullBoxes, exactly the boxes
    * [[parse]] reads. A header fixture, not a playable movie — there are
    * no media samples (mdat) and none are pretended.
    */
  def syntheticMp4(durationMs: Long, width: Int, height: Int,
      nFrames: Int, timescale: Int = 1000): Array[Byte] = {
    val ascii = charset.StandardCharsets.US_ASCII
    val ftyp = box("ftyp", "isom".getBytes(ascii),
      bytesOf(_.putInt(512), 4), "iso2".getBytes(ascii))
    val mvhd = box("mvhd", bytesOf({ bb =>
      bb.putInt(0)                                   // version 0 + flags
      bb.putInt(0).putInt(0)                         // ctime, mtime
      bb.putInt(timescale)
      bb.putInt((durationMs * timescale / 1000L).toInt)
      bb.putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      bb.position(bb.position() + 10)                // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt) // unity matrix
      bb.position(bb.position() + 24)                // pre_defined
      bb.putInt(2)                                   // next_track_ID
    }, 100))
    val tkhd = box("tkhd", bytesOf({ bb =>
      bb.putInt(3)                                   // version 0, flags enabled|in-movie
      bb.putInt(0).putInt(0)                         // ctime, mtime
      bb.putInt(1).putInt(0)                         // track_ID, reserved
      bb.putInt((durationMs * timescale / 1000L).toInt)
      bb.position(bb.position() + 8 + 2 + 2 + 2 + 2) // reserved/layer/group/volume
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(width << 16).putInt(height << 16)    // 16.16 fixed
    }, 84))
    val stsz = box("stsz", bytesOf({ bb =>
      bb.putInt(0)        // version + flags
      bb.putInt(1000)     // uniform sample_size (no per-sample table)
      bb.putInt(nFrames)  // sample_count
    }, 12))
    ftyp ++ box("moov", mvhd,
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stsz)))))
  }
}
