from .chat_template import ChatMessage, ChatTemplate, TemplateFormat, sanitize_content
from .think import extract_thinking
