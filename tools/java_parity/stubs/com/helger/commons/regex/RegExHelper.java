package com.helger.commons.regex;
import java.util.regex.Pattern;
public final class RegExHelper {
  public static boolean stringMatchesPattern(final String re, final String s) {
    return Pattern.compile(re).matcher(s).matches();
  }
}
