/**
 * Generate committed GIF image fixtures for the q348 exact-hash gate:
 * existing BMP/PNG fixture images are re-encoded as GIF under id
 * 400+i. The re-encode is of the image's integer LUMA raster: a
 * grayscale raster has <= 256 distinct values, so the GIF palette
 * holds them exactly and the round-trip is LOSSLESS -- the gate can
 * demand dHash EQUALITY with the independent python twin hash (and,
 * transitively, pixel-exact luma), unlike JPEG's hamming-3 tolerance.
 *
 * Provenance / independence: this program shares no code with the
 * hand-rolled Scala GIF/LZW decoder under test. It encodes with the
 * JDK's own GIF writer and re-decodes its output with the JDK's GIF
 * READER, asserting pixel-exact luma at generation -- so the committed
 * bytes are certified correct GIFs by an implementation that is not
 * the one being gated.
 *
 * Usage: java scripts/GenGifFixture.java
 * Writes: src/test/resources/graft/sources/images_gif/img_4NN.gif
 */
import java.awt.image.BufferedImage;
import java.io.File;
import javax.imageio.ImageIO;

public final class GenGifFixture {

  public static void main(String[] args) throws Exception {
    File srcDir = new File("src/test/resources/graft/sources/images");
    File outDir = new File("src/test/resources/graft/sources/images_gif");
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
      // GIF writer keeps an indexed image's palette verbatim (a
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
      File out = new File(outDir, String.format("img_%03d.gif", 400 + id));
      if (!ImageIO.write(gray, "gif", out))
        throw new IllegalStateException("no gif writer");
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
    System.out.println("ok: 30 lossless GIFs");
  }
}
