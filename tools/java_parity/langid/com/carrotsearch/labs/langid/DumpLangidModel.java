// Dumps the reference's bundled langid.py model (langid.lzma, decoded by
// the reference's own Model.defaultModel()) to a portable big-endian
// binary so the Python engine can load the REAL model.  Lives in the same
// package to reach the package-private fields.  Also supports classifying
// base64 texts for parity checks:  DumpLangidModel <out.bin> [texts.b64]
package com.carrotsearch.labs.langid;

import java.io.DataOutputStream;
import java.io.BufferedOutputStream;
import java.io.FileOutputStream;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.util.Base64;
import java.util.List;

public class DumpLangidModel {
  public static void main(String[] args) throws Exception {
    Model m = Model.defaultModel();
    try (DataOutputStream out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(args[0])))) {
      out.writeInt(m.m_aLangClasses.length);
      for (String s : m.m_aLangClasses) out.writeUTF(s);
      out.writeInt(m.nb_ptc.length);
      for (float v : m.nb_ptc) out.writeFloat(v);
      out.writeInt(m.nb_pc.length);
      for (float v : m.nb_pc) out.writeFloat(v);
      out.writeInt(m.m_aDsa.length);
      for (short v : m.m_aDsa) out.writeShort(v);
      out.writeInt(m.m_aDsaOutput.length);
      for (int[] row : m.m_aDsaOutput) {
        if (row == null) { out.writeInt(-1); continue; }
        out.writeInt(row.length);
        for (int v : row) out.writeInt(v);
      }
    }
    if (args.length > 1) {
      LangIdV3 lid = new LangIdV3();
      List<String> texts = Files.readAllLines(new java.io.File(args[1]).toPath(),
          StandardCharsets.UTF_8);
      Base64.Decoder b64 = Base64.getDecoder();
      for (int i = 0; i < texts.size(); i++) {
        String t = new String(b64.decode(texts.get(i)), StandardCharsets.UTF_8);
        DetectedLanguage r = lid.classify(t, true);
        System.out.println(i + "\t" + r.getLangCode() + "\t"
            + String.format("%.9g", r.getConfidence()));
      }
    }
  }
}
