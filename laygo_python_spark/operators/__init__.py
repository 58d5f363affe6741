"""Operator library: relational uplift + training-data-pipeline operators.

Modules register standalone ``DataFrame -> DataFrame`` functions usable
directly or spliced into a fluent program via ``Transformer.pipe``.
"""
