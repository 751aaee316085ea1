"""Serve an exported bundle over HTTP (see serve/server.py for the
endpoint contract).

  python -m triad_tpu.cli.serve --bundle ./bundle --port 8080
"""

from triad_tpu.serve.server import main

if __name__ == "__main__":
    main()
