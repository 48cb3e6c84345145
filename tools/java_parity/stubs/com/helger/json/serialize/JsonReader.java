package com.helger.json.serialize;
import java.io.File;
import com.helger.json.IJson;
public final class JsonReader {
  public static IJson readFromFile(final File f) { throw new UnsupportedOperationException("stub"); }
  public static IJson readFromString(final String s) { throw new UnsupportedOperationException("stub"); }
}
