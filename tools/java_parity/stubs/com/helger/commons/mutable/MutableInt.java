package com.helger.commons.mutable;
public final class MutableInt {
  private int v;
  public MutableInt(final int init) { v = init; }
  public void inc() { v++; }
  public void inc(final MutableInt o) { v += o.v; }
  public int intValue() { return v; }
}
