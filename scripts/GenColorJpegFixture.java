/**
 * Generate committed COLOR JPEG fixtures for the q362 gate (verdict
 * r12 #4): re-encode the color BMPs staged by
 * scripts/gen_color_image_fixture.py as baseline COLOR JPEGs — the
 * chroma-subsampled case that dominates real image corpora and that
 * the grayscale q344 fixtures cannot exercise.
 *
 * Chroma subsampling is ASSERTED from the bytes, not assumed: the
 * SOF0 marker of every written file must carry a luma sampling factor
 * strictly greater than the chroma factors (4:2:0/4:2:2), or this
 * generator fails. If the JDK writer ever stopped subsampling at the
 * chosen quality, the fixture would be silently weaker — hence the
 * marker check.
 *
 * Selection discipline (same as GenJpegFixture.java): keep candidates
 * whose own-decode round-trip moves the 64-bit luma dHash <= 2 bits
 * (the q362 gate allows 3) — fixture selection for margin, not gate
 * weakening. The real certification is the q362 gate: the Spark-side
 * javax.imageio decode + luma collapse of these COLOR files must land
 * hamming <= 3 of the INDEPENDENT python twin hash
 * (images_color_twin.parquet, computed from pre-encoding RGB arrays).
 * This program shares no code with the Scala path: JDK readers/writer
 * only, and its dHash is only used for candidate selection.
 *
 * Usage: java scripts/GenColorJpegFixture.java
 * Reads:  /tmp/graft_color_src/img_NNN.bmp   (run the python staging first)
 * Writes: src/test/resources/graft/sources/images_jpeg_color/img_NNN.jpg
 */
import java.awt.image.BufferedImage;
import java.io.File;
import java.nio.file.Files;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.FileImageOutputStream;

public final class GenColorJpegFixture {

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

  /** Walk JPEG markers to SOF0/SOF1/SOF2; assert >1 component and
   *  luma sampling strictly above every chroma sampling (subsampled). */
  static void assertChromaSubsampled(File f) throws Exception {
    byte[] b = Files.readAllBytes(f.toPath());
    int i = 2; // past FFD8
    while (i + 3 < b.length) {
      if ((b[i] & 0xff) != 0xff) throw new IllegalStateException(
          "marker walk lost at " + i + " in " + f);
      int marker = b[i + 1] & 0xff;
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2;
        continue;
      }
      int len = ((b[i + 2] & 0xff) << 8) | (b[i + 3] & 0xff);
      if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
        int ncomp = b[i + 9] & 0xff;
        if (ncomp < 3) throw new IllegalStateException(
            f + " is not color (SOF components=" + ncomp + ")");
        int y = b[i + 11] & 0xff; // component 0 (Y) sampling HxV
        int yh = y >> 4, yv = y & 0xf;
        for (int c = 1; c < ncomp; c++) {
          int s = b[i + 11 + 3 * c] & 0xff;
          int ch = s >> 4, cv = s & 0xf;
          if (!(yh > ch || yv > cv)) throw new IllegalStateException(
              f + " chroma NOT subsampled (Y=" + yh + "x" + yv
              + " C" + c + "=" + ch + "x" + cv + ")");
        }
        return;
      }
      if (marker == 0xDA) break; // SOS: no SOF seen
      i += 2 + len;
    }
    throw new IllegalStateException("no SOF marker in " + f);
  }

  public static void main(String[] args) throws Exception {
    File srcDir = new File("/tmp/graft_color_src");
    File outDir =
        new File("src/test/resources/graft/sources/images_jpeg_color");
    outDir.mkdirs();
    for (File old : outDir.listFiles()) old.delete();
    File[] srcs = srcDir.listFiles((d, n) -> n.endsWith(".bmp"));
    if (srcs == null || srcs.length == 0) throw new IllegalStateException(
        "no staged BMPs; run scripts/gen_color_image_fixture.py first");
    java.util.Arrays.sort(srcs);
    int kept = 0, maxHam = 0;
    StringBuilder skipped = new StringBuilder();
    for (File src : srcs) {
      if (kept >= 30) break;
      String id = src.getName().replaceAll("img_(\\d+)\\.bmp", "$1");
      BufferedImage orig = ImageIO.read(src);
      if (orig == null) throw new IllegalStateException("unreadable " + src);
      int w = orig.getWidth(), h = orig.getHeight();
      // force a packed RGB color model for the writer
      BufferedImage rgb =
          new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR);
      rgb.getGraphics().drawImage(orig, 0, 0, null);
      File out = new File(outDir, "img_" + id + ".jpg");
      Iterator<ImageWriter> ws =
          ImageIO.getImageWritersByFormatName("jpeg");
      ImageWriter wr = ws.next();
      ImageWriteParam p = wr.getDefaultWriteParam();
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
      p.setCompressionQuality(0.7f);
      try (FileImageOutputStream os = new FileImageOutputStream(out)) {
        wr.setOutput(os);
        wr.write(null, new IIOImage(rgb, null, null), p);
      }
      wr.dispose();
      assertChromaSubsampled(out);
      BufferedImage back = ImageIO.read(out);
      long hOrig = dhash(luma(orig), w, h);
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
    if (kept < 25) throw new IllegalStateException(
        "only " + kept + " candidates had margin; skipped:" + skipped);
    System.out.println("ok: " + kept + " color JPEGs (4:2:0 asserted), "
        + "worst round-trip hamming " + maxHam + "; skipped:" + skipped);
  }
}
