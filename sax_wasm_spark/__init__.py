"""sax_wasm_spark — PySpark-native streaming SAX tokenizer and
main-content extraction engine (reference: justinwilaby/sax-wasm)."""

__version__ = "0.1.0"
