package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipelines.{Completion, HttpEmbedder}
import graft.operators.Prompt

class CompletionSpec extends AnyFunSuite {

  test("J2: completion request body shape (multirag.c:18-49)") {
    assert(Completion.requestJson("hi \"there\"\n", 64) ==
      """{"prompt": "hi \"there\"\n", "n_predict": 64, "stream": true}""")
  }

  test("J3: $.content extraction with escapes; None on malformed") {
    assert(Completion.extractContent("""{"content": "a\nb\"c"}""") == Some("a\nb\"c"))
    assert(Completion.extractContent("""{"content": "uniA!"}""") == Some("uniA!"))
    assert(Completion.extractContent("""{"other": 1}""") == None)
    assert(Completion.extractContent("""{"content": 5}""") == None)
    assert(Completion.extractContent("""{"content": "unterminated""") == None)
  }

  test("S2: streamed chunk prefix skip + token extract (curl_helpers.c:28-67)") {
    assert(Completion.streamToken("""data: {"content": "tok"}""") == Some("tok"))
    assert(Completion.streamToken("""xxxx {"content": "t2"}""") == Some("t2"))
    assert(Completion.streamToken("""{"content": "raw"}""") == Some("raw"))
    assert(Completion.streamToken("") == None)
  }

  test("S2 tee: accumulateStream folds chunks and tees tokens in order " +
    "(curl_helpers.c:44-62)") {
    val chunks = Iterator(
      """data: {"content": "Hel"}""",
      "",                              // empty chunk: skipped
      """data: {"content": "lo"}""",
      ": keep-alive",                  // non-token chunk: no content
      """{"content": ", world"}""")    // raw-JSON fallback
    val teed = scala.collection.mutable.ArrayBuffer.empty[String]
    val full = Completion.accumulateStream(chunks, teed += _)
    assert(full == "Hello, world")
    assert(teed.toSeq == Seq("Hel", "lo", ", world"))
  }

  test("conversation-only prompt: first turn + growth " +
    "(update_conversation_only_prompt, multirag.c:191-246)") {
    val p1 = Prompt.updateConversationOnlyPrompt("first q", None, "")
    assert(p1 == Prompt.SingleSystemMsg + "first q" + Prompt.ConvTerminator)
    val p2 = Prompt.updateConversationOnlyPrompt("second q", Some("answer one"), p1)
    assert(p2 == p1 + "answer one" + Prompt.ConvUserTag + "second q" + Prompt.ConvTerminator)
    // this path spells "assistant" correctly, unlike the RAG path
    assert(Prompt.ConvTerminator.contains("assistant"))
    assert(Prompt.AssistantMsgStart.contains("assistent"))
  }

  test("A2: conversation accumulation across turns (multirag.c:155-234)") {
    val c1 = Prompt.conversationWithUserTurn("", "first q")
    val c2 = Completion.addLlmResponse(c1, "answer one")
    val c3 = Prompt.conversationWithUserTurn(c2, "second q")
    assert(c3 ==
      Prompt.UserMsgStart + "first q" + Prompt.AssistantMsgStart +
        "answer one" + Prompt.UserMsgStart + "second q" + Prompt.AssistantMsgStart)
  }

  test("J1: embedding response parse (embedding-from-server.c:40-104)") {
    val resp = """[ { "embedding": [ [0.013, -0.205, 1.5e-3] ] } ]"""
    assert(HttpEmbedder.parseEmbedding(resp) == Seq(0.013, -0.205, 1.5e-3))
    intercept[IllegalArgumentException] {
      HttpEmbedder.parseEmbedding("""{"no": "embedding"}""")
    }
  }
}
