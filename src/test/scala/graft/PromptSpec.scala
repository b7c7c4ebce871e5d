package graft

import graft.operators.Prompt

class PromptSpec extends SparkSpec {
  import spark.implicits._

  test("assemble produces the reference instruct format in rank order") {
    // feed ranks out of order to prove the shuffle-safe sort idiom
    val topk = Seq((2, "second ctx"), (1, "first ctx"), (3, "third ctx")).toDF("rank", "text")
    val got = Prompt.assemble(topk, "rank", "text", "", "hi there").head().getString(0)
    val want = Prompt.SystemMsgStart +
      "Context 1:\nfirst ctx \n Context 2:\nsecond ctx \n Context 3:\nthird ctx \n " +
      Prompt.UserMsgStart + "hi there" + Prompt.AssistantMsgStart
    assert(got == want)
  }

  test("conversation is threaded between system contexts and user turn") {
    val topk = Seq((1, "ctx")).toDF("rank", "text")
    val got = Prompt.assemble(topk, "rank", "text", "PRIOR", "q2").head().getString(0)
    assert(got.contains("ctx \n PRIOR" + Prompt.UserMsgStart + "q2"))
  }
}
