/**
 * Generate committed Avro fixtures with ONE-LEVEL COMPLEX types for
 * the q399 gate (graft.sources.AvroSource — array<primitive> and
 * map<string,primitive> support): real corpus metadata shapes (tags,
 * per-field scores) routinely nested one level.
 *
 * Written through the APACHE AVRO-JAVA library (the reference encoder,
 * on the Spark distribution's classpath) — the Scala reader under test
 * shares no code with it (the q369 seam discipline).
 *
 * Rows follow a FORMULA that scripts/gen_avro_complex_twin.py
 * (pyarrow, no avro) implements independently for the twin parquet
 * (i = 0..59); primitives sit BETWEEN containers so any container
 * mis-decode desynchronizes a gated primitive:
 *   id       long                  = i
 *   tags     array<string>         = len i%4, elem j: "t" + ((i+j)%7)
 *   w        double                = i / 4.0
 *   scores   map<string,double>    = {} when i%5==0
 *                                    else {a: i*0.5, b: i*0.25}
 *   opt_ids  ["null",array<long>]  = null when i%6==0
 *                                    else len i%3, elem j: i*10 + j
 *   label    string                = "r" + i
 *
 * avro_cx_000.avro: codec null,    rows 0..29, syncInterval 64
 *                   (multiple blocks: the block walk on committed
 *                   bytes, now with container payloads);
 * avro_cx_001.avro: codec deflate, rows 30..59.
 *
 * Usage: java -cp "/opt/spark/jars/*" scripts/GenAvroComplexFixture.java
 * Writes: src/test/resources/graft/sources/avro_complex/avro_cx_NNN.avro
 */
import java.io.File;
import java.util.ArrayList;
import java.util.LinkedHashMap;
import java.util.List;
import java.util.Map;
import org.apache.avro.Schema;
import org.apache.avro.file.CodecFactory;
import org.apache.avro.file.DataFileWriter;
import org.apache.avro.generic.GenericData;
import org.apache.avro.generic.GenericDatumWriter;
import org.apache.avro.generic.GenericRecord;

public final class GenAvroComplexFixture {

  static final String SCHEMA_JSON =
      "{\"type\":\"record\",\"name\":\"row\",\"fields\":["
      + "{\"name\":\"id\",\"type\":\"long\"},"
      + "{\"name\":\"tags\",\"type\":"
      + "{\"type\":\"array\",\"items\":\"string\"}},"
      + "{\"name\":\"w\",\"type\":\"double\"},"
      + "{\"name\":\"scores\",\"type\":"
      + "{\"type\":\"map\",\"values\":\"double\"}},"
      + "{\"name\":\"opt_ids\",\"type\":[\"null\","
      + "{\"type\":\"array\",\"items\":\"long\"}]},"
      + "{\"name\":\"label\",\"type\":\"string\"}]}";

  static GenericRecord row(Schema schema, int i) {
    GenericRecord r = new GenericData.Record(schema);
    r.put("id", (long) i);
    List<String> tags = new ArrayList<>();
    for (int j = 0; j < i % 4; j++) tags.add("t" + ((i + j) % 7));
    r.put("tags", tags);
    r.put("w", i / 4.0);
    Map<String, Double> scores = new LinkedHashMap<>();
    if (i % 5 != 0) {
      scores.put("a", i * 0.5);
      scores.put("b", i * 0.25);
    }
    r.put("scores", scores);
    if (i % 6 == 0) {
      r.put("opt_ids", null);
    } else {
      List<Long> ids = new ArrayList<>();
      for (int j = 0; j < i % 3; j++) ids.add((long) (i * 10 + j));
      r.put("opt_ids", ids);
    }
    r.put("label", "r" + i);
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
    Schema schema = new Schema.Parser().parse(SCHEMA_JSON);
    File dir = new File("src/test/resources/graft/sources/avro_complex");
    if (!dir.isDirectory() && !dir.mkdirs())
      throw new IllegalStateException("cannot create " + dir);
    write(new File(dir, "avro_cx_000.avro"), schema, 0, 30,
        CodecFactory.nullCodec());
    write(new File(dir, "avro_cx_001.avro"), schema, 30, 60,
        CodecFactory.deflateCodec(6));
  }
}
