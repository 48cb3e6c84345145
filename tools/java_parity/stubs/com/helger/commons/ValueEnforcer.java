package com.helger.commons;
public final class ValueEnforcer {
  public static String notEmpty(final String v, final String name) {
    if (v == null || v.isEmpty()) throw new IllegalArgumentException(name + " must not be empty");
    return v;
  }
}
