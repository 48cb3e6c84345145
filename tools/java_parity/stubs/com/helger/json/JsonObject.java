package com.helger.json;
import java.util.Iterator;
import java.util.Map;
public class JsonObject implements IJsonObject {
  public JsonObject() {}
  public JsonObject(final int size) {}
  public JsonObject addAll(final Map<String, ?> values) { return this; }
  public JsonObject add(final String key, final Object value) { return this; }
  public String getAsString(final String key) { return null; }
  public Iterable<IJson> getAsArray(final String key) { return null; }
  public IJsonObject getAsObject(final String key) { return null; }
  public Iterator<Map.Entry<String, IJson>> iterator() { return null; }
}
