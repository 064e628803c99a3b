# host pipeline orchestration: XMP splitting, external tools, EXIF, CLIs
