package com.helger.json;
public interface IJsonValue extends IJson {
  int getAsInt();
}
