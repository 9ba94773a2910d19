"""Legacy shim package (reference: core/models/)."""
