package com.helger.commons.annotation;
public @interface Nonempty {}
