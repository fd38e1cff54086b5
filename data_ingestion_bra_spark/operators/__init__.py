"""Reusable engine operators beyond plain DataFrame methods.

Each module implements one operator family as compositions of built-in
DataFrame/Column expressions (JVM-side, codegen-friendly); Pandas UDFs appear
only where expressions genuinely can't express the semantics (multimodal
decode stubs).
"""
