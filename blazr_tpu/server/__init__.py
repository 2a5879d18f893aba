from .app import AppState, create_app, run_server
