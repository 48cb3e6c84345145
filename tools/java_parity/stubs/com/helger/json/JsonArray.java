package com.helger.json;
public class JsonArray implements IJson {
  public JsonArray addAll(final int[] values) { return this; }
}
