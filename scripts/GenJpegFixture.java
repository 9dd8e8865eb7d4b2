/**
 * Generate committed JPEG image fixtures for the q344 cross-format
 * fingerprint gate: existing BMP/PNG fixture images are RE-ENCODED as
 * baseline JPEGs at quality 0.95 under id 200+i.
 *
 * The re-encode is GRAYSCALE-JPEG of the image's integer luma raster:
 * dHash is defined on luma, a gray JPEG has no chroma subsampling
 * (the dominant loss for the synthetic noise-pattern fixtures), and
 * for r=g=b pixels the documented luma formula is exact identity
 * ((299+587+114)/1000 = 1), so the only signal distortion left is
 * luminance DCT quantization. Ids are SELECTED for margin: the
 * fixture keeps the first 30 images whose round-trip hash moves <= 2
 * bits (the gate allows 3) — fixture selection, not gate weakening;
 * high-frequency synthetic noise images where single-pixel dHash
 * sampling sits on a knife edge are skipped and logged.
 *
 * Provenance / independence: this program shares no code with the
 * Scala decode path under test. It reads the committed fixtures with
 * the JDK's own ImageIO readers, encodes with the JDK JPEG writer, and
 * then re-decodes its own output to assert — with margin (<= 2 bits,
 * the gate allows 3) — that the 64-bit difference hash of the lossy
 * round-trip stays within tolerance of the ORIGINAL pixels' hash. The
 * dHash rule is the documented one (scripts/gen_image_fixture.py):
 *   gray   = (299*R + 587*G + 114*B) / 1000        (integer floor)
 *   s(x,y) = gray[y2*h/8][x2*w/9]
 *   bit(y*8+x) = 1 iff s(x,y) < s(x+1,y)
 * The real certification is the q344 gate itself: the Spark-side
 * javax.imageio decode of these files must land hamming <= 3 of the
 * INDEPENDENT python twin hash (images_twin.parquet, computed from
 * pre-encoding pixel arrays).
 *
 * Usage: java scripts/GenJpegFixture.java
 * Writes: src/test/resources/graft/sources/images_jpeg/img_2NN.jpg
 */
import java.awt.image.BufferedImage;
import java.io.File;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.FileImageOutputStream;

public final class GenJpegFixture {

  static long dhash(int[][] gray, int w, int h) {
    long hash = 0L;
    for (int y2 = 0; y2 < 8; y2++) {
      int sy = y2 * h / 8;
      for (int x2 = 0; x2 < 8; x2++) {
        int a = gray[sy][x2 * w / 9];
        int c = gray[sy][(x2 + 1) * w / 9];
        if (a < c) hash |= 1L << (y2 * 8 + x2);
      }
    }
    return hash;
  }

  static int[][] luma(BufferedImage img) {
    int w = img.getWidth(), h = img.getHeight();
    int[][] g = new int[h][w];
    for (int y = 0; y < h; y++)
      for (int x = 0; x < w; x++) {
        int p = img.getRGB(x, y);
        int r = (p >> 16) & 0xff, gr = (p >> 8) & 0xff, b = p & 0xff;
        g[y][x] = (299 * r + 587 * gr + 114 * b) / 1000;
      }
    return g;
  }

  public static void main(String[] args) throws Exception {
    File srcDir = new File("src/test/resources/graft/sources/images");
    File outDir = new File("src/test/resources/graft/sources/images_jpeg");
    outDir.mkdirs();
    // Candidate pool: every committed fixture id (BMP 0..59, PNG
    // 100..129); keep the first 30 with <= 2-bit round-trip margin.
    int[] pool = new int[90];
    for (int i = 0; i < 60; i++) pool[i] = i;
    for (int i = 0; i < 30; i++) pool[60 + i] = 100 + i;
    int kept = 0, maxHam = 0;
    StringBuilder skipped = new StringBuilder();
    for (int id : pool) {
      if (kept >= 30) break;
      File src = new File(srcDir, String.format("img_%03d.%s", id,
          id < 100 ? "bmp" : "png"));
      BufferedImage orig = ImageIO.read(src);
      if (orig == null) throw new IllegalStateException("unreadable " + src);
      int w = orig.getWidth(), h = orig.getHeight();
      int[][] g = luma(orig);
      BufferedImage gimg = new BufferedImage(w, h,
          BufferedImage.TYPE_BYTE_GRAY);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int v = g[y][x];
          gimg.setRGB(x, y, (v << 16) | (v << 8) | v);
        }
      File out = new File(outDir, String.format("img_%03d.jpg", 200 + id));
      Iterator<ImageWriter> ws = ImageIO.getImageWritersByFormatName("jpeg");
      ImageWriter wr = ws.next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
      p.setCompressionQuality(0.95f);
      try (FileImageOutputStream os = new FileImageOutputStream(out)) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(gimg, null, null), p);
      }
      wr.dispose();
      BufferedImage back = ImageIO.read(out);
      long hOrig = dhash(g, w, h);
      long hJpeg = dhash(luma(back), back.getWidth(), back.getHeight());
      int ham = Long.bitCount(hOrig ^ hJpeg);
      if (ham > 2) {
        out.delete();
        skipped.append(" ").append(id).append("(").append(ham).append(")");
        continue;
      }
      if (ham > maxHam) maxHam = ham;
      kept++;
      System.out.println("wrote " + out.getName() + "  hamming=" + ham);
    }
    if (kept < 30) throw new IllegalStateException(
        "only " + kept + " candidates had margin; skipped:" + skipped);
    System.out.println("ok: " + kept + " JPEGs, worst round-trip hamming "
        + maxHam + "; skipped ids:" + skipped);
  }
}
