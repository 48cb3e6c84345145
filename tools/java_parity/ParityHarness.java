// Parity harness: drives the REFERENCE's own compiled Detector (sources
// compiled read-only from /root/reference, with minimal dependency stubs)
// against exported profile data and seeded input texts, printing the full
// posterior list per (text, seed) so the Python side can compare its
// faithful Detector bit-for-bit.
//
// Input:
//   args[0] = profiles TSV dir: one file per language, first line
//             "name<TAB>n1<TAB>n2<TAB>n3", then "gram<TAB>count" lines
//             (grams base64-encoded UTF-8 to survive whitespace);
//             files loaded in sorted order (matches our loader).
//   args[1] = texts file: one base64(UTF-8 text) per line
//   args[2] = comma-separated seeds, one per text line
// Output: per text line: "i<TAB>lang:prob,lang:prob,..." (17 sig digits)

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
import com.cybozu.labs.langdetect.Language;
import com.cybozu.labs.langdetect.util.LangProfile;
import com.helger.commons.mutable.MutableInt;

public class ParityHarness {
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
    List<String> texts = Files.readAllLines(new File(args[1]).toPath(), StandardCharsets.UTF_8);
    String[] seeds = args[2].split(",");
    for (int i = 0; i < texts.size(); i++) {
      String text = new String(b64.decode(texts.get(i)), StandardCharsets.UTF_8);
      DetectorFactory.setSeed(Long.parseLong(seeds[i]));
      Detector d = DetectorFactory.create();
      d.append(text);
      StringBuilder sb = new StringBuilder();
      sb.append(i).append('\t');
      try {
        List<Language> probs = d.getProbabilities();
        for (Language l : probs) {
          sb.append(l.getLanguage()).append(':')
            .append(String.format("%.17g", l.getProbability())).append(',');
        }
      } catch (Exception e) {
        sb.append("ERROR:").append(e.getMessage());
      }
      System.out.println(sb);
    }
  }
}
