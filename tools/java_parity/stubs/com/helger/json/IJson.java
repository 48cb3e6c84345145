package com.helger.json;
public interface IJson {
  default boolean isObject() { return false; }
  default IJsonObject getAsObject() { return null; }
  default IJsonValue getAsValue() { return null; }
}
