/**
 * Generate committed Avro object-container fixtures for the q369 gate
 * (graft.sources.AvroSource — the hand-parsed native reader).
 *
 * Written through the APACHE AVRO-JAVA library (the reference encoder,
 * on the Spark distribution's classpath) — the Scala reader under test
 * shares no code with it, so the two implementations of the public
 * Avro 1.12 spec meet only at the gate (the GIF/JPEG seam discipline).
 *
 * Rows follow a FORMULA that scripts/gen_avro_twin.py (pyarrow, no
 * avro) implements independently for the twin parquet:
 *   id       long    = i                       (0..99)
 *   rank     int     = 1000 - i
 *   name     string  = "n_" + i + ("_caf\u00e9" when i%7==0)  [utf-8]
 *   value    double  = i * 1.25 - 30
 *   ratio    float   = i / 8.0f
 *   flag     boolean = i % 3 == 0
 *   opt_qty  ["null","long"] = null when i%4==0 else i*7
 *   payload  bytes   = [i & 0xff, (i+1) & 0xff, (i+2) & 0xff]
 *
 * avro_000.avro: codec null,    rows 0..49, syncInterval 64 so the
 *                file holds MULTIPLE blocks (the block walk + sync
 *                verification path is exercised by committed bytes);
 * avro_001.avro: codec deflate, rows 50..99 (raw-DEFLATE inflate).
 *
 * Usage: java -cp "/opt/spark/jars/*" scripts/GenAvroFixture.java
 * Writes: src/test/resources/graft/sources/avro/avro_NNN.avro
 */
import java.io.File;
import java.nio.ByteBuffer;
import org.apache.avro.Schema;
import org.apache.avro.file.CodecFactory;
import org.apache.avro.file.DataFileWriter;
import org.apache.avro.generic.GenericData;
import org.apache.avro.generic.GenericDatumWriter;
import org.apache.avro.generic.GenericRecord;

public final class GenAvroFixture {

  static final String SCHEMA_JSON =
      "{\"type\":\"record\",\"name\":\"row\",\"fields\":["
      + "{\"name\":\"id\",\"type\":\"long\"},"
      + "{\"name\":\"rank\",\"type\":\"int\"},"
      + "{\"name\":\"name\",\"type\":\"string\"},"
      + "{\"name\":\"value\",\"type\":\"double\"},"
      + "{\"name\":\"ratio\",\"type\":\"float\"},"
      + "{\"name\":\"flag\",\"type\":\"boolean\"},"
      + "{\"name\":\"opt_qty\",\"type\":[\"null\",\"long\"]},"
      + "{\"name\":\"payload\",\"type\":\"bytes\"}]}";

  static GenericRecord row(Schema schema, int i) {
    GenericRecord r = new GenericData.Record(schema);
    r.put("id", (long) i);
    r.put("rank", 1000 - i);
    // é (e-acute) kept as an escape so a non-UTF-8 javac default
    // encoding cannot mangle the source literal
    r.put("name", "n_" + i + (i % 7 == 0 ? "_caf\u00e9" : ""));
    r.put("value", i * 1.25 - 30);
    r.put("ratio", i / 8.0f);
    r.put("flag", i % 3 == 0);
    r.put("opt_qty", i % 4 == 0 ? null : (Long) (long) (i * 7));
    r.put("payload", ByteBuffer.wrap(new byte[] {
        (byte) (i & 0xff), (byte) ((i + 1) & 0xff),
        (byte) ((i + 2) & 0xff)}));
    return r;
  }

  static void write(File out, Schema schema, int from, int to,
      CodecFactory codec) throws Exception {
    DataFileWriter<GenericRecord> w =
        new DataFileWriter<>(new GenericDatumWriter<GenericRecord>(schema));
    w.setCodec(codec);
    w.setSyncInterval(64); // tiny: force multiple blocks per file
    w.create(schema, out);
    for (int i = from; i < to; i++) w.append(row(schema, i));
    w.close();
    System.out.println("wrote " + out + " rows " + from + ".." + (to - 1));
  }

  public static void main(String[] args) throws Exception {
    File dir = new File("src/test/resources/graft/sources/avro");
    dir.mkdirs();
    for (File old : dir.listFiles()) old.delete();
    Schema schema = new Schema.Parser().parse(SCHEMA_JSON);
    write(new File(dir, "avro_000.avro"), schema, 0, 50,
        CodecFactory.nullCodec());
    write(new File(dir, "avro_001.avro"), schema, 50, 100,
        CodecFactory.deflateCodec(6));
  }
}
