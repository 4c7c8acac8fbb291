"""I/O: snapshot output stream, PETSc-binary compatibility, checkpointing."""
