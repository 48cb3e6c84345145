// Throughput harness: times the REFERENCE's own compiled Detector
// (sources compiled read-only from /root/reference) over a batch of
// texts, single-threaded, after a JIT warmup pass.  Same profile-loading
// path as ParityHarness.  Output: one line "n<TAB>seconds".
//
//   args[0] = profiles TSV dir (see ParityHarness)
//   args[1] = texts file (base64 per line)
//   args[2] = warmup docs (prefix reused)

import java.io.File;
import java.lang.reflect.Field;
import java.lang.reflect.Method;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.util.Arrays;
import java.util.Base64;
import java.util.List;
import java.util.Map;

import com.cybozu.labs.langdetect.Detector;
import com.cybozu.labs.langdetect.DetectorFactory;
import com.cybozu.labs.langdetect.util.LangProfile;
import com.helger.commons.mutable.MutableInt;

public class ThroughputHarness {
  @SuppressWarnings("unchecked")
  public static void main(String[] args) throws Exception {
    File[] files = new File(args[0]).listFiles();
    Arrays.sort(files);
    int n = files.length;
    Field freqF = LangProfile.class.getDeclaredField("m_aFreq");
    freqF.setAccessible(true);
    Field nwF = LangProfile.class.getDeclaredField("m_aNWords");
    nwF.setAccessible(true);
    Method addProfile = DetectorFactory.class.getDeclaredMethod(
        "addProfile", LangProfile.class, int.class, int.class);
    addProfile.setAccessible(true);
    Base64.Decoder b64 = Base64.getDecoder();
    int idx = 0;
    for (File f : files) {
      List<String> lines = Files.readAllLines(f.toPath(), StandardCharsets.UTF_8);
      String[] head = lines.get(0).split("\t");
      LangProfile p = new LangProfile(head[0]);
      int[] nw = (int[]) nwF.get(p);
      for (int i = 0; i < 3; i++) nw[i] = Integer.parseInt(head[i + 1]);
      Map<String, MutableInt> freq = (Map<String, MutableInt>) freqF.get(p);
      for (int li = 1; li < lines.size(); li++) {
        String[] kv = lines.get(li).split("\t");
        String gram = new String(b64.decode(kv[0]), StandardCharsets.UTF_8);
        freq.put(gram, new MutableInt(Integer.parseInt(kv[1])));
      }
      addProfile.invoke(null, p, idx++, n);
    }
    List<String> lines = Files.readAllLines(new File(args[1]).toPath(), StandardCharsets.UTF_8);
    String[] texts = new String[lines.size()];
    for (int i = 0; i < texts.length; i++)
      texts[i] = new String(b64.decode(lines.get(i)), StandardCharsets.UTF_8);
    int warmup = Integer.parseInt(args[2]);
    long guard = 0;
    for (int i = 0; i < warmup; i++) {
      guard += detectOne(texts[i % texts.length], 1000 + 7 * i);
    }
    long t0 = System.nanoTime();
    for (int i = 0; i < texts.length; i++) {
      guard += detectOne(texts[i], 1000 + 7 * i);
    }
    double sec = (System.nanoTime() - t0) / 1e9;
    System.out.println(texts.length + "\t" + sec + "\t#" + guard);
  }

  static int detectOne(String text, long seed) throws Exception {
    DetectorFactory.setSeed(seed);
    Detector d = DetectorFactory.create();
    d.append(text);
    try {
      return d.detect().length();
    } catch (Exception e) {
      return 0;
    }
  }
}
