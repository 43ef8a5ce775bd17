package graft.tools

import graft.functions.PerceptualHash
import graft.llm.Multimodal

/** Dev probe: measure dHash Hamming distance between a BMP fixture and
  * its JPEG re-encode at several qualities / scales — the measurement
  * behind the codec-tolerance bounds in MultimodalSpec. */
object ProbeJpeg {
  def jpegEncode(img: java.awt.image.BufferedImage, q: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(q)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    for (scale <- Seq(1, 8); q <- Seq(0.75f, 0.9f, 0.95f, 1.0f)) {
      val dists = (0L until 200L).map { id =>
        val b = Multimodal.syntheticBmp(id)
        val src = if (scale == 1) b
          else Multimodal.resizeBmpBytes(b, 9 * scale, 8 * scale).get
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
        val jpg = jpegEncode(img, q)
        val hj = PerceptualHash.hash64(jpg, true)
        if (hj == null) -1
        else java.lang.Long.bitCount(hj.longValue() ^ PerceptualHash.dhash64(b))
      }
      println(f"scale=$scale q=$q%.2f min=${dists.min} max=${dists.max} " +
        f"mean=${dists.sum.toDouble / dists.size}%.2f " +
        s"over7=${dists.count(_ > 7)}")
    }
    // PNG / GIF exactness probe
    val pngBad = (0L until 200L).count { id =>
      val b = Multimodal.syntheticBmp(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      PerceptualHash.hash64(out.toByteArray, true).longValue() !=
        PerceptualHash.dhash64(b)
    }
    val gifBad = (0L until 200L).count { id =>
      val b = Multimodal.syntheticBmp(id)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "gif", out)
      val h = PerceptualHash.hash64(out.toByteArray, true)
      h == null || h.longValue() != PerceptualHash.dhash64(b)
    }
    println(s"png mismatches=$pngBad gif mismatches=$gifBad")
  }
}
