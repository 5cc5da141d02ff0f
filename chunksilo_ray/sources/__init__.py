"""File-tree sources: format-dispatch document loading over Ray Data."""
