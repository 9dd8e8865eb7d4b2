/**
 * Generate committed TIFF image fixtures for the q359 exact-hash gate:
 * existing BMP/PNG fixture images are re-encoded as TIFF under id
 * 600+i. The re-encode is of the image's integer LUMA raster as an
 * indexed 256-gray image -- TIFF stores it losslessly, so the gate
 * demands dHash EQUALITY with the independent python twin hash (the
 * GIF/q348 contract; the decode seam under test is the JDK ImageIO
 * TIFF plugin via MediaCodec.decodeTiffGray).
 *
 * This program certifies the committed bytes at generation by
 * re-decoding its own output with the JDK reader and asserting
 * pixel-exact luma; the gate's ground truth (the twin hash) never
 * passed through ImageIO at all.
 *
 * Usage: java scripts/GenTiffFixture.java
 * Writes: src/test/resources/graft/sources/images_tiff/img_6NN.tiff
 */
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;

public final class GenTiffFixture {

  public static void main(String[] args) throws Exception {
    File srcDir = new File("src/test/resources/graft/sources/images");
    File outDir = new File("src/test/resources/graft/sources/images_tiff");
    outDir.mkdirs();
    int[] ids = new int[30];
    for (int i = 0; i < 20; i++) ids[i] = i;          // img_000..019.bmp
    for (int i = 0; i < 10; i++) ids[20 + i] = 100 + i; // img_1NN.png
    for (int id : ids) {
      File src = new File(srcDir, String.format("img_%03d.%s", id,
          id < 100 ? "bmp" : "png"));
      BufferedImage orig = ImageIO.read(src);
      if (orig == null) throw new IllegalStateException("unreadable " + src);
      int w = orig.getWidth(), h = orig.getHeight();
      // TYPE_BYTE_INDEXED with an explicit 256-entry gray palette: the
      // TIFF writer keeps an indexed image's palette verbatim (a
      // non-indexed input goes through its quantizer, which is lossy)
      byte[] ramp = new byte[256];
      for (int i = 0; i < 256; i++) ramp[i] = (byte) i;
      java.awt.image.IndexColorModel icm =
          new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp);
      BufferedImage gray = new BufferedImage(w, h,
          BufferedImage.TYPE_BYTE_INDEXED, icm);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int p = orig.getRGB(x, y);
          int r = (p >> 16) & 0xff, g = (p >> 8) & 0xff, b = p & 0xff;
          int v = (299 * r + 587 * g + 114 * b) / 1000;
          gray.getRaster().setSample(x, y, 0, v);
        }
      File out = new File(outDir, String.format("img_%03d.tiff", 600 + id));
      if (!ImageIO.write(gray, "tiff", out))
        throw new IllegalStateException("no tiff writer");
      BufferedImage back = ImageIO.read(out);
      if (back.getWidth() != w || back.getHeight() != h)
        throw new IllegalStateException("dims changed for " + id);
      for (int y = 0; y < h; y++)
        for (int x = 0; x < w; x++) {
          int a = gray.getRGB(x, y) & 0xff;
          int b2 = back.getRGB(x, y) & 0xff;
          if (a != b2) throw new IllegalStateException(
              "lossy round-trip at img " + id + " (" + x + "," + y + "): "
              + a + " != " + b2);
        }
      System.out.println("wrote " + out.getName() + " (pixel-exact)");
    }
    System.out.println("ok: 30 lossless TIFFs");
  }
}
