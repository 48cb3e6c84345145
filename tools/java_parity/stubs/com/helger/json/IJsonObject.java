package com.helger.json;
import java.util.Map;
public interface IJsonObject extends IJson, Iterable<Map.Entry<String, IJson>> {
  String getAsString(String key);
  Iterable<IJson> getAsArray(String key);
  IJsonObject getAsObject(String key);
  IJsonObject add(String key, Object value);
}
