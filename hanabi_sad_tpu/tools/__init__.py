"""Analysis and CLI tools (reference pyhanabi/tools/)."""
